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
