package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Similarity

/** [[Similarity.semanticDedup]] — the SemDeDup composite: IVF-bucketed
  * cosine pairs resolved to keep/drop by connected components. The spec
  * pins the decision semantics the qNN oracle can't isolate: transitive
  * chains merge into one cluster even when the endpoints' own cosine is
  * below threshold, singletons (including broken vectors) always keep,
  * and exactly one representative survives per cluster. */
class SemanticDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def vec(theta: Double): Array[Double] =
    Array(math.cos(theta), math.sin(theta))

  test("transitive near-dup chain collapses to one cluster, min-id rep") {
    import spark.implicits._
    // angles 0, θ, 2θ with cos(θ) ≈ 0.999 > minCos but cos(2θ) ≈ 0.996 <
    // minCos: the 0–2θ pair exists only through the chain — exactly what
    // pairwise pruning without CC would get wrong
    val theta = math.acos(0.999)
    val vs = Seq(
      (10L, vec(0)), (11L, vec(theta)), (12L, vec(2 * theta)),
      (20L, Array(0.0, -1.0)) // far from everything: singleton
    ).toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(vs, centroidPred = col("vec_id") === 10L,
        minCos = 0.998)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .sortBy(_._1)
    assert(out.toSeq == Seq(
      (10L, 10L, true), (11L, 10L, false), (12L, 10L, false),
      (20L, 20L, true)))
  }

  test("two independent clusters keep one rep each; singletons keep") {
    import spark.implicits._
    val vs = Seq(
      (1L, Array(1.0, 0.0)), (2L, Array(0.9999, 0.0141)),
      (3L, Array(0.0, 1.0)), (4L, Array(0.0141, 0.9999)),
      (5L, Array(0.7071, 0.7071))
    ).toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(vs,
        centroidPred = col("vec_id").isin(1L, 3L), minCos = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, 1L, true), (2L, 1L, false),
      (3L, 3L, true), (4L, 3L, false),
      (5L, 5L, true)))
    assert(out.count(_._3) == 3) // exactly one keeper per cluster + singleton
  }

  test("broken vectors (zero-norm, NULL) are singleton keepers, not errors") {
    import spark.implicits._
    val vs = Seq(
      (1L, Array(1.0, 0.0)), (2L, Array(0.9999, 0.0141)),
      (3L, Array(0.0, 0.0)),                 // zero-norm
      (4L, Option.empty[Array[Double]].orNull) // failed encoder
    ).toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(vs, centroidPred = col("vec_id") === 1L,
        minCos = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, 1L, true), (2L, 1L, false), (3L, 3L, true), (4L, 4L, true)))
  }
}
