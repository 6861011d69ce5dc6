package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Similarity

/** [[Similarity.labelCentroidOutliers]] — per-label centroid cosine with
  * scaled-integer determinism. The spec replays the exact arithmetic
  * contract (floor(x·1e6) sums → one double division → left-fold cosine)
  * on a hand-sized fixture, and pins the quarantine + loud-guard
  * behavior. */
class LabelOutliersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** The operator's documented arithmetic, restated independently:
    * integer-scaled per-dim mean, then the shared left-fold cosine. */
  private def expectedCos(vecs: Seq[Array[Double]], v: Array[Double]): Double = {
    val dim = vecs.head.length
    val mean = Array.tabulate(dim) { i =>
      vecs.map(x => math.floor(x(i) * 1e6).toLong).sum.toDouble /
        (1e6 * vecs.length)
    }
    def dot(a: Array[Double], b: Array[Double]) =
      a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))
    dot(v, mean) / (math.sqrt(dot(v, v)) * math.sqrt(dot(mean, mean)))
  }

  test("cos_scaled matches the scaled-integer centroid arithmetic exactly") {
    import spark.implicits._
    val aVecs = Seq(Array(1.0, 0.0), Array(0.9, 0.1), Array(-1.0, 0.0))
    val bVecs = Seq(Array(0.0, 1.0), Array(0.0, 0.8))
    val rows = aVecs.zipWithIndex.map { case (v, i) => (i.toLong, 0L, v) } ++
      bVecs.zipWithIndex.map { case (v, i) => (10L + i, 1L, v) }
    val out = Similarity.labelCentroidOutliers(
        rows.toDF("vec_id", "label", "embedding"), minCos = 0.5)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3)))
      .toMap
    rows.foreach { case (id, lbl, v) =>
      val group = if (lbl == 0L) aVecs else bVecs
      val want = math.floor(expectedCos(group, v) * 1e6).toLong
      assert(out(id)._1 == want, s"vec $id")
      assert(out(id)._2 == (want < 500000L), s"flag of vec $id")
    }
    // the fixture flags the anti-aligned member and nothing else
    assert(out.filter(_._2._2).keySet == Set(2L))
  }

  test("broken vectors are quarantined out, not scored or crashed on") {
    import spark.implicits._
    val rows = Seq(
      (1L, 0L, Array(1.0, 0.0)),
      (2L, 0L, Array(0.0, 0.0)),                  // zero-norm
      (3L, 0L, Option.empty[Array[Double]].orNull) // failed encoder
    ).toDF("vec_id", "label", "embedding")
    val ids = Similarity.labelCentroidOutliers(rows, minCos = 0.5)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L))
  }

  test("merged centroid-sums artifact ≡ full recomputation (additive roll-forward)") {
    import spark.implicits._
    val b1 = Seq((1L, 0L, Array(1.0, 0.0)), (2L, 0L, Array(0.9, 0.1)),
      (10L, 1L, Array(0.0, 1.0))).toDF("vec_id", "label", "embedding")
    val b2 = Seq((3L, 0L, Array(-1.0, 0.0)), (11L, 1L, Array(0.0, 0.8)),
      (20L, 2L, Array(0.5, 0.5))).toDF("vec_id", "label", "embedding")
    val merged = Similarity.mergeCentroidSums(
      Similarity.labelCentroidSums(b1), Similarity.labelCentroidSums(b2))
    val incr = Similarity.scoreAgainstCentroidSums(b2, merged, minCos = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3)))
      .sortBy(_._1)
    val full = Similarity.labelCentroidOutliers(
        b1.unionByName(b2), minCos = 0.5)
      .filter(col("vec_id").isin(3L, 11L, 20L))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3)))
      .sortBy(_._1)
    assert(incr.toSeq == full.toSeq)
    assert(incr.nonEmpty)
  }

  test("data-cardinality label column fails loudly, never an OOM broadcast") {
    import spark.implicits._
    val rows = (0L until 50L).map(i => (i, i, Array(1.0, 0.0)))
      .toDF("vec_id", "label", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.labelCentroidOutliers(rows, minCos = 0.5, maxLabels = 10)
    }
    assert(e.getMessage.contains("maxLabels"))
  }

  test("centroidDrift: self is the fixed point, rotation drops the cosine, one-sided labels drop") {
    import spark.implicits._
    val a = Seq((0L, 0L, Array(1.0, 0.0)), (1L, 0L, Array(0.8, 0.2)),
        (2L, 1L, Array(0.0, 1.0)), (9L, 2L, Array(0.5, 0.5)))
      .toDF("vec_id", "label", "embedding")
    // label 0 shifted toward y; label 1 identical; label 2 absent
    val b = Seq((3L, 0L, Array(0.0, 1.0)), (4L, 1L, Array(0.0, 2.0)))
      .toDF("vec_id", "label", "embedding")
    val sa = Similarity.labelCentroidSums(a)
    val sb = Similarity.labelCentroidSums(b)
    val drift = Similarity.centroidDrift(sa, sb)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(drift.keySet === Set(0L, 1L)) // label 2 one-sided → dropped
    assert(drift(0L)._1 === 2L && drift(0L)._2 === 1L)
    // label 1: both centroids point along +y → cos = 1 (exact: the
    // sequential fold sees [0, n]·[0, m])
    assert(drift(1L)._3 === 1000000L)
    // label 0: sum_a = (1800000, 200000), sum_b = (0, 1000000) —
    // hand-fold the documented arithmetic
    val (sax, say, sby) = (1800000.0, 200000.0, 1000000.0)
    val c = say * sby / (math.sqrt(sax * sax + say * say) * sby)
    assert(drift(0L)._3 === math.floor(c * 1e6).toLong)
    // self-drift: every label at its fixed point (cos(v, v), which the
    // fold realizes exactly enough that floor(·1e6) = 1e6 here)
    val self = Similarity.centroidDrift(sa, sa).collect()
    assert(self.length === 3)
    self.foreach(r => assert(r.getLong(3) === 1000000L))
    // merge-then-drift ≡ drift of the union (the additive artifact law)
    val merged = Similarity.mergeCentroidSums(sa, sb)
    val viaMerge = Similarity.centroidDrift(merged, merged).collect()
    assert(viaMerge.forall(_.getLong(3) === 1000000L))
  }
}
