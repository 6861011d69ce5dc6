package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Similarity

/** JL random projection: exact values against the constant-derived
  * matrix, the quarantine contract, and the domain guard. */
class JlProjectSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("projected values are the literal Rademacher dots, in order") {
    import spark.implicits._
    val v = Seq(0.5, -1.0, 2.0, 0.25)
    val out = Similarity.randomProject(
      Seq((1L, v)).toDF("vec_id", "embedding"), dimIn = 4, dimOut = 3)
      .select("proj").as[Seq[Double]].head()
    val r = Similarity.jlMatrix(3, 4)
    val want = (0 until 3).map(j => v.zip(r(j)).map { case (a, b) => a * b }
      .foldLeft(0.0)(_ + _))
    assert(out === want)
  }

  test("identical vectors project identically — cosine 1 survives") {
    import spark.implicits._
    val df = Seq((1L, Seq(1.0, 2.0, 3.0, 4.0)), (2L, Seq(1.0, 2.0, 3.0, 4.0)))
      .toDF("vec_id", "embedding")
    val p = Similarity.randomProject(df, 4, 2).collect()
      .map(_.getAs[scala.collection.Seq[Double]]("proj").toSeq)
    assert(p(0) === p(1))
  }

  test("broken vectors quarantine before projection") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0, 2.0)),
      (2L, Seq(Double.NaN, 2.0)), // non-finite element
      (3L, Seq(1.0)), // wrong length
      (4L, null.asInstanceOf[Seq[Double]]))
      .toDF("vec_id", "embedding")
    val kept = Similarity.randomProject(df, 2, 1)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(kept === Seq(1L))
  }

  test("projected sign-LSH recovers near pairs, verified in the ORIGINAL space") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0, 2.0, 0.0, 1.0, 0.5, 0.0, 0.0, 1.0)),
      (2L, Seq(1.0, 2.0, 0.0, 1.0, 0.5, 0.0, 0.0, 1.0)), // exact dup
      (3L, Seq(0.0, 0.0, 3.0, 0.0, 0.0, 1.0, 2.0, 0.0))) // far
      .toDF("vec_id", "embedding")
    val out = Similarity.projectedSignLshPairs(df, minCos = 0.95,
      dimIn = 8, dimOut = 4).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1),
      r.getAs[Long]("cos_scaled"))).toSeq === Seq((1L, 2L, 1000000L)))
  }

  test("projecting up fails fast") {
    import spark.implicits._
    val df = Seq((1L, Seq(1.0, 2.0))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.randomProject(df, 2, 4)
    }
    assert(e.getMessage.contains("JL"))
  }
}
