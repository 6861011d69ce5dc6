package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Similarity

/** Per-cluster cohesion and separation on hand-built clusters, with the
  * expected micro-cosines recomputed from first principles (same
  * float→double widening, same left-fold dot, same floor·1e6). */
class IvfQualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val vecs: Seq[(Long, Array[Float])] = Seq(
    1L -> Array(1.0f, 0.0f),   // centroid A
    2L -> Array(0.8f, 0.6f),   // member of A (cos 0.8 vs 0.6)
    3L -> Array(0.9f, 0.1f),   // member of A
    5L -> Array(0.0f, 1.0f),   // centroid B
    6L -> Array(0.3f, 0.9f),   // member of B
    7L -> Array(0.0f, 0.0f))   // unassignable

  private def frame() = {
    import spark.implicits._
    vecs.toDF("vec_id", "embedding")
  }

  private def cosMicro(a: Array[Float], b: Array[Float]): Long = {
    def dot(x: Array[Double], y: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < x.length) { s += x(i) * y(i); i += 1 }
      s
    }
    val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
    math.floor(dot(ad, bd) / (math.sqrt(dot(ad, ad)) * math.sqrt(dot(bd, bd)))
      * 1e6).toLong
  }

  test("cohesion sums/mins and nearest-other-centroid separation are exact") {
    val byId = vecs.toMap
    val cents = Similarity.collectCentroids(
      frame().filter(col("vec_id").isin(1L, 5L)))
    val out = Similarity.ivfQualityReport(frame(), cents)
      .collect().map(r => r.getAs[Long]("bucket") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("sum_cos_micro"),
          r.getAs[Long]("min_cos_micro"), r.getAs[Long]("nn_sep_micro"))))
      .toMap
    val aMembers = Seq(1L, 2L, 3L).map(i => cosMicro(byId(i), byId(1L)))
    val bMembers = Seq(5L, 6L).map(i => cosMicro(byId(i), byId(5L)))
    val sep = cosMicro(byId(1L), byId(5L)) // orthogonal → 0
    assert(out(1L) === ((3L, aMembers.sum, aMembers.min, sep)))
    assert(out(5L) === ((2L, bMembers.sum, bMembers.min, sep)))
    assert(sep === 0L)
  }

  test("a single centroid is rejected — separation is undefined") {
    val one = Similarity.collectCentroids(frame().filter(col("vec_id") === 1L))
    intercept[IllegalArgumentException] {
      Similarity.ivfQualityReport(frame(), one)
    }
  }

  test("zero-norm centroids emit NO report row (matching the oracle)") {
    import graft.llm.Centroid
    // Z has no defined cosine against anything; with only Z as A's
    // neighbor, A's separation is undefined too — both must vanish from
    // the report exactly as the SQL twin's NaN-filtered inner join drops
    // them (the pre-fix fold emitted nn_sep_micro = Long.MinValue rows)
    val a = Centroid(1L, Array(1.0, 0.0), 1.0)
    val b = Centroid(5L, Array(0.0, 1.0), 1.0)
    val z = Centroid(9L, Array(0.0, 0.0), 0.0)
    val mixed = Similarity.ivfQualityReport(frame(), Array(a, b, z))
      .select("bucket").collect().map(_.getLong(0)).toSet
    assert(mixed === Set(1L, 5L))          // Z dropped, A/B finite pair
    val starved = Similarity.ivfQualityReport(frame(), Array(a, z))
    assert(starved.count() === 0L)          // A's only neighbor is NaN
  }
}
