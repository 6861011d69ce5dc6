package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{Dedup, Similarity}

/** [[Similarity.semanticDedupIncremental]] — the identity that makes it
  * trustworthy: one new batch decided against a persisted index +
  * cluster artifact equals the full-union [[Similarity.semanticDedup]]
  * restricted to the new batch, and the rolled-forward artifact equals
  * the full-union cluster table — including the hard case where a new
  * vector BRIDGES two old clusters that were never near-dups of each
  * other. */
class SemanticDedupIncrementalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def vec(theta: Double): Array[Double] =
    Array(math.cos(theta), math.sin(theta))

  // cos(θ) ≈ 0.999: adjacent angles pair at minCos = 0.9975; angles 3θ
  // apart (cos ≈ 0.991) do not
  private val theta = math.acos(0.999)
  private val minCos = 0.9975

  private def b1 = {
    import spark.implicits._
    // two old clusters: {1, 2} at angles 0, θ and {3, 4} at 4θ, 5θ —
    // 3θ apart at the nearest ends, so never pairwise near-dups
    Seq((1L, vec(0)), (2L, vec(theta)),
      (3L, vec(4 * theta)), (4L, vec(5 * theta)))
      .toDF("vec_id", "embedding")
  }

  private def b2 = {
    import spark.implicits._
    // 10 at 2.5θ bridges both old clusters (1.5θ to members of each);
    // 11 is a far singleton
    Seq((10L, vec(2.5 * theta)), (11L, Array(0.0, -1.0)))
      .toDF("vec_id", "embedding")
  }

  test("incremental decisions ≡ full-union run restricted to the new batch") {
    val dir = Files.createTempDirectory("graft-semdedup-idx").toString
    Similarity.buildIndex(b1,
      Similarity.collectCentroids(b1.filter(col("vec_id") === 1L)), dir)
    val oldClusters = Dedup.dupClusters(
      Similarity.embeddingNearDupPairs(b1,
        centroidPred = col("vec_id") === 1L, minCos))
      .select("doc_id", "cluster_id")
    val (decisions, updated) = Similarity.semanticDedupIncremental(
      b2, dir, oldClusters, minCos)
    val got = decisions.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1)
    val full = Similarity.semanticDedup(b1.unionByName(b2),
        centroidPred = col("vec_id") === 1L, minCos)
      .filter(col("vec_id") >= 10L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1)
    assert(got.toSeq == full.toSeq)
    // the bridge merged everything under label 1; the singleton keeps
    assert(got.toSeq == Seq((10L, 1L, false), (11L, 11L, true)))

    // artifact roll-forward ≡ full-union cluster table: old cluster 3's
    // label forwards to 1 through the bridge
    val gotArt = updated.collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val fullArt = Dedup.dupClusters(
      Similarity.embeddingNearDupPairs(b1.unionByName(b2),
        centroidPred = col("vec_id") === 1L, minCos))
      .select("doc_id", "cluster_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(gotArt.toSeq == fullArt.toSeq)
    assert(gotArt.toSeq == Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L),
      (10L, 1L)))
  }

  test("a batch with no near-dups leaves the artifact unchanged") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-semdedup-idx2").toString
    Similarity.buildIndex(b1,
      Similarity.collectCentroids(b1.filter(col("vec_id") === 1L)), dir)
    val oldClusters = Dedup.dupClusters(
      Similarity.embeddingNearDupPairs(b1,
        centroidPred = col("vec_id") === 1L, minCos))
      .select("doc_id", "cluster_id")
    val lone = Seq((20L, Array(0.0, -1.0))).toDF("vec_id", "embedding")
    val (decisions, updated) = Similarity.semanticDedupIncremental(
      lone, dir, oldClusters, minCos)
    assert(decisions.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq ==
      Seq((20L, 20L, true)))
    assert(updated.collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1).toSeq ==
      oldClusters.collect().map(r => (r.getLong(0), r.getLong(1)))
        .sortBy(_._1).toSeq)
  }
}
