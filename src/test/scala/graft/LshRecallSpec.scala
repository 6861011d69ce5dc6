package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Similarity

/** LSH recall/precision audit: exact counts against a hand-built ground
  * truth, the sample restriction on the pair set, and the loud
  * all-pairs cap. */
class LshRecallSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def vecs = {
    import spark.implicits._
    Seq(
      (1L, Seq(1f, 0f, 0f, 0f)),
      (2L, Seq(1f, 0f, 0f, 0f)), // exact dup of 1 — the one true pair
      (3L, Seq(0f, 1f, 0f, 0f)),
      (4L, Seq(0f, 0f, 1f, 0f)))
      .toDF("vec_id", "embedding")
  }

  private def pairs(ps: (Long, Long)*) = {
    import spark.implicits._
    ps.toDF("id_a", "id_b")
  }

  test("counts and shares: a half-right pair set audits at 50% precision") {
    val out = Similarity.lshRecallReport(vecs, pairs((1L, 2L), (3L, 4L)),
      minCos = 0.9, dim = 4).collect().head
    assert(out.getAs[Long]("n_sample") === 4L)
    assert(out.getAs[Long]("n_true") === 1L)
    assert(out.getAs[Long]("n_cand") === 2L)
    assert(out.getAs[Long]("n_hit") === 1L)
    assert(out.getAs[Long]("recall_micro") === 1000000L)
    assert(out.getAs[Long]("precision_micro") === 500000L)
  }

  test("an empty pair set audits at zero recall, not a divide error") {
    val out = Similarity.lshRecallReport(vecs, pairs(),
      minCos = 0.9, dim = 4).collect().head
    assert(out.getAs[Long]("n_cand") === 0L)
    assert(out.getAs[Long]("recall_micro") === 0L)
    assert(out.getAs[Long]("precision_micro") === 0L)
  }

  test("samplePred restricts both ground truth and the audited pairs") {
    val out = Similarity.lshRecallReport(vecs, pairs((1L, 2L), (3L, 4L)),
      minCos = 0.9, dim = 4, samplePred = col("vec_id") <= 2)
      .collect().head
    assert(out.getAs[Long]("n_sample") === 2L)
    assert(out.getAs[Long]("n_cand") === 1L) // (3,4) has no endpoint in sample
    assert(out.getAs[Long]("precision_micro") === 1000000L)
  }

  test("the all-pairs cap fails fast and names the knob") {
    val e = intercept[IllegalArgumentException] {
      Similarity.lshRecallReport(vecs, pairs(), minCos = 0.9, dim = 4,
        maxSample = 2)
    }
    assert(e.getMessage.contains("samplePred"))
  }

  private def ladder(rows: (String, Long, Long, Long)*) = {
    import spark.implicits._
    rows.toDF("tier", "n_cand", "recall_micro", "precision_micro")
      .withColumn("n_sample", lit(10L)).withColumn("n_true", lit(10L))
      .withColumn("n_hit", lit(10L))
  }

  test("config selector: the cheapest tier meeting the target wins") {
    val lad = ladder(
      ("t_wide", 500L, 990000L, 100000L),
      ("t_cheap", 100L, 960000L, 400000L),
      ("t_coarse", 50L, 800000L, 900000L))
    val out = Similarity.selectLshConfig(lad, 950000L).collect()
    assert(out.length === 1)
    assert(out.head.getAs[String]("tier") === "t_cheap") // not t_wide
    assert(out.head.getAs[Boolean]("met_target"))
    assert(out.head.getAs[Long]("target_recall_micro") === 950000L)
  }

  test("config selector: no qualifier → highest recall, flagged unmet") {
    val lad = ladder(
      ("t_a", 500L, 900000L, 100000L),
      ("t_b", 100L, 940000L, 400000L))
    val out = Similarity.selectLshConfig(lad, 950000L).collect().head
    assert(out.getAs[String]("tier") === "t_b")
    assert(!out.getAs[Boolean]("met_target"))
  }

  test("config selector: n_cand ties break by recall then tier name") {
    val lad = ladder(
      ("t_b", 100L, 970000L, 400000L),
      ("t_a", 100L, 970000L, 400000L),
      ("t_hi", 100L, 990000L, 400000L))
    val out = Similarity.selectLshConfig(lad, 950000L).collect().head
    assert(out.getAs[String]("tier") === "t_hi") // recall beats name
    val out2 = Similarity.selectLshConfig(
      ladder(("t_b", 100L, 970000L, 1L), ("t_a", 100L, 970000L, 2L)),
      950000L).collect().head
    assert(out2.getAs[String]("tier") === "t_a")
    intercept[IllegalArgumentException] {
      Similarity.selectLshConfig(lad, 1000001L)
    }
  }

  test("a real tier audits its own analytic recall trade") {
    // sign-LSH over the 4 vectors: the exact-dup pair must be recovered
    // (identical bits land in every band) — recall 10⁶ on this corpus
    val p = Similarity.signLshNearDupPairs(vecs, minCos = 0.9, dim = 4)
    val out = Similarity.lshRecallReport(vecs, p, minCos = 0.9, dim = 4)
      .collect().head
    assert(out.getAs[Long]("recall_micro") === 1000000L)
    assert(out.getAs[Long]("precision_micro") === 1000000L)
  }
}
