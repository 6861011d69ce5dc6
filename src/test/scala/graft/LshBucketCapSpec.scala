package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Dedup

/** The LSH degenerate-bucket guard: one pathological band bucket of n
  * near-identical docs yields n² candidate pairs; the cap sheds it
  * deterministically while leaving healthy buckets untouched. */
class LshBucketCapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def corpus = {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").limit(40)
    // 30 exact copies of one doc = a degenerate bucket in every band
    val boiler = (0 until 30).map(i =>
      (900000L + i, "the same boilerplate page text repeated verbatim " * 5))
      .toDF("doc_id", "text")
    docs.unionByName(boiler)
  }

  test("the cap is reachable from BOTH verified entry points") {
    import spark.implicits._
    // the guard only matters if the public pair generators can engage it
    val capped = Dedup.verifiedNearDupPairs(corpus, maxBucketSize = Some(10))
      .filter(col("id_a") >= 900000L).count()
    assert(capped == 0, "boilerplate bucket must be shed by the cap")
    val uncapped = Dedup.verifiedNearDupPairs(corpus)
      .filter(col("id_a") >= 900000L).count()
    assert(uncapped == 30L * 29 / 2, "without the cap the blowup is real")
    // incremental path: new batch = the boilerplate, existing = the rest
    val existing = Dedup.withSignature(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
          .select("doc_id", "text").limit(40))
      .select(col("doc_id"), col("sh"), col("bkeys"))
    val boiler = (0 until 30).map(i =>
      (900000L + i, "the same boilerplate page text repeated verbatim " * 5))
      .toDF("doc_id", "text")
    val inc = Dedup.incrementalNearDupPairs(boiler, existing,
      maxBucketSize = Some(10)).count()
    assert(inc == 0)
  }

  test("no cap / loose cap: identical candidates; tight cap sheds the blowup") {
    val signed = Dedup.withSignature(corpus)
      .select(col("doc_id"), col("sh"), col("bkeys"))
      .localCheckpoint(true)
    val uncapped = Dedup.candidatePairs(signed)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val loose = Dedup.candidatePairs(signed, maxBucketSize = Some(1000))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(loose == uncapped)
    // 30 identical docs → C(30,2) = 435 boilerplate pairs dominate
    val boilerPairs = uncapped.count { case (a, b) => a >= 900000L && b >= 900000L }
    assert(boilerPairs == 435)
    val capped = Dedup.candidatePairs(signed, maxBucketSize = Some(10))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!capped.exists { case (a, b) => a >= 900000L && b >= 900000L })
    // healthy buckets are untouched
    assert(capped == uncapped.filterNot { case (a, b) => a >= 900000L && b >= 900000L })
  }
}
