package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Similarity

/** The broadcast nearest-eval decontamination scan: flags, nearest
  * reporting, tie-breaks, and the quarantine/guard branches. */
class SemanticDecontamScanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("flags at the threshold, reports the nearest eval everywhere") {
    import spark.implicits._
    val evalSet = Seq(
      (10L, Seq(1.0, 0.0, 0.0)),
      (20L, Seq(0.0, 1.0, 0.0)))
      .toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, Seq(2.0, 0.0, 0.0)), // cos 1 with eval 10 → flagged
      (2L, Seq(1.0, 1.0, 0.0)), // cos ~0.707 to both → nearest 10, clean
      (3L, Seq(0.0, 0.0, 0.0)), // zero-norm: NaN everywhere → NULLs
      (4L, null.asInstanceOf[Seq[Double]]),
      (5L, Seq(2.0, 0.0)),      // wrong dim: would fake cos 1 truncated
      (6L, Seq(2.0, 0.0, 0.0, 0.0))) // wrong dim the other way
      .toDF("vec_id", "embedding")
    val out = Similarity.semanticDecontaminate(corpus, evalSet,
        minCos = 0.95).collect()
      .map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2)),
        r.getAs[Boolean]("contaminated")))).toMap
    assert(out(1L) === ((Some(10L), Some(1000000L), true)))
    assert(out(2L)._1 === Some(10L)) // ties break to the LOWER eval id
    assert(out(2L)._3 === false)
    assert(out(3L) === ((None, None, false)))
    assert(out(4L) === ((None, None, false)))
    // wrong-dimension vectors quarantine — no truncated-dot false flag
    assert(out(5L) === ((None, None, false)))
    assert(out(6L) === ((None, None, false)))
  }

  test("mixed-dimension eval set fails fast") {
    import spark.implicits._
    val corpus = Seq((1L, Seq(1.0, 0.0))).toDF("vec_id", "embedding")
    val mixed = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.5)))
      .toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Similarity.semanticDecontaminate(corpus, mixed, 0.9)
    }
  }

  test("empty eval set and oversized eval set fail fast") {
    import spark.implicits._
    val corpus = Seq((1L, Seq(1.0))).toDF("vec_id", "embedding")
    val none = Seq.empty[(Long, Seq[Double])].toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Similarity.semanticDecontaminate(corpus, none, 0.9)
    }
    val two = Seq((1L, Seq(1.0)), (2L, Seq(0.5)))
      .toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Similarity.semanticDecontaminate(corpus, two, 0.9, maxEval = 1)
    }
  }
}
