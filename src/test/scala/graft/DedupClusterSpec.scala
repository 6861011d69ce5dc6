package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Dedup

/** Connected-component dup clustering: chains (multi-round propagation),
  * separate components, and representative flags. */
class DedupClusterSpec extends AnyFunSuite {

  test("qualityReps: highest score wins, ties to the lower id, one rep per cluster") {
    val spark0 = TestSpark.spark
    import spark0.implicits._
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("doc_id", "cluster_id")
    val scores = Seq((1L, 5L), (2L, 9L), (3L, 9L), (10L, 4L), (11L, 7L))
      .toDF("doc_id", "score")
    val out = graft.llm.Dedup.qualityReps(clusters, scores)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    // cluster 1: 2 and 3 tie at 9 -> lower id 2; cluster 10: 11 beats 10
    // (the case where min-id would keep the WORSE doc)
    assert(out == Map(1L -> false, 2L -> true, 3L -> false,
      10L -> false, 11L -> true))
  }

  test("qualityReps: a cluster member without a score row fails loudly") {
    val spark0 = TestSpark.spark
    import spark0.implicits._
    val clusters = Seq((1L, 1L), (2L, 1L)).toDF("doc_id", "cluster_id")
    val scores = Seq((1L, 5L)).toDF("doc_id", "score") // 2 missing
    val ex = intercept[Exception] {
      graft.llm.Dedup.qualityReps(clusters, scores).collect()
    }
    // the wiring error must surface, not silently drop member 2 (which
    // would also have flipped the representative choice)
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("no score row")))
  }
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("min-label propagation resolves chains and separate components") {
    // component {1,2,3,4} as a chain (needs >1 round) + component {10,11}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    val got = Dedup.dupClusters(pairs)
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got == Set(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false), (4L, 1L, false),
      (10L, 10L, true), (11L, 10L, false)))
  }

  test("a long path still converges (label walks the diameter)") {
    val pairs = (1L until 9L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Dedup.dupClusters(pairs)
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got.forall(_._2 == 1L))
    assert(got.count(_._3) == 1)
  }

  test("convergence survives 64-bit-scale labels (no long-sum overflow)") {
    // four labels near Long.MaxValue/2 sum past Long.MaxValue — a LONG
    // convergence sum would throw under ANSI (or wrap and falsely
    // converge without it); the decimal(38,0) sum must not care
    val big = Long.MaxValue / 2
    val pairs = Seq((big, big + 1), (big + 2, big + 3)).toDF("id_a", "id_b")
    val got = Dedup.dupClusters(pairs)
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got == Set(
      (big, big, true), (big + 1, big, false),
      (big + 2, big + 2, true), (big + 3, big + 2, false)))
  }

  test("exceeding maxIter fails loudly instead of emitting partial clusters") {
    // diameter ~9 > maxIter 2: a silent exit would return several
    // cluster_ids (and representatives) for ONE true component
    val pairs = (1L until 9L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val e = intercept[IllegalStateException](
      Dedup.dupClusters(pairs, maxIter = 2).collect())
    assert(e.getMessage.contains("did not converge"))
  }
}
