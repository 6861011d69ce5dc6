package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{Dedup, Sampling}

/** The operator-internal persist barriers must be releasable by a
  * long-lived session (the ADVICE leak: repeated batch calls accreting
  * cached tables forever), and the config guards must fail loudly. */
class CacheBarriersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("releaseAll unpersists operator-internal barriers") {
    import spark.implicits._
    CacheBarriers.releaseAll() // drain barriers left by earlier suites
    spark.sharedState.cacheManager.clearCache() // and non-registered ones
    val docs =(0 until 40).map { i =>
      (i.toLong, (s"alpha beta gamma delta $i " * 4) + "epsilon zeta")
    }.toDF("doc_id", "text")
    val pairs = Dedup.verbatimOverlapPairs(docs, shingleN = 4)
    pairs.count() // consume the returned frame (materializes the barrier)
    assert(!spark.sharedState.cacheManager.isEmpty)
    assert(CacheBarriers.releaseAll() >= 1)
    assert(spark.sharedState.cacheManager.isEmpty)
    assert(CacheBarriers.releaseAll() == 0) // idempotent, nothing left
  }

  test("withScope releases its own barriers and leaves others alone") {
    import spark.implicits._
    CacheBarriers.releaseAll()
    spark.sharedState.cacheManager.clearCache()
    // an "other pipeline's" barrier, registered to the global scope
    val outside = CacheBarriers.barrier(
      Seq((1L, "a")).toDF("doc_id", "text"))
    outside.count()
    assert(outside.storageLevel.useMemory)
    val docs = (0 until 40).map { i =>
      (i.toLong, (s"alpha beta gamma delta $i " * 4) + "epsilon zeta")
    }.toDF("doc_id", "text")
    CacheBarriers.withScope {
      Dedup.verbatimOverlapPairs(docs, shingleN = 4).count()
    }
    // the scope released the operator's internal barrier on exit...
    assert(CacheBarriers.releaseAll() == 1) // ...but NOT the outside one
    assert(!outside.storageLevel.useMemory)
    assert(spark.sharedState.cacheManager.isEmpty)
  }

  test("temperatureRates leaves no cache behind and validates alpha") {
    import spark.implicits._
    CacheBarriers.releaseAll()
    spark.sharedState.cacheManager.clearCache()
    val docs = Seq((1L, "en"), (2L, "en"), (3L, "en"), (4L, "de"))
      .toDF("doc_id", "lang")
    val rates = Sampling.temperatureRates(docs, "lang")
    // eager + self-releasing: the strata-sized rate table is a local
    // relation and the internal counts barrier is gone already
    assert(spark.sharedState.cacheManager.isEmpty)
    val byLang = rates.collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(byLang("de") == 1000000L) // rarest stratum keeps everything
    assert(byLang("en") < 1000000L)
    // alpha = 1 is the identity mix; out-of-range temperatures are loud
    val id1 = Sampling.temperatureRates(docs, "lang", alpha = 1.0)
    assert(id1.collect().forall(_.getLong(2) == 1000000L))
    intercept[IllegalArgumentException](
      Sampling.temperatureRates(docs, "lang", alpha = 1.5))
    intercept[IllegalArgumentException](
      Sampling.temperatureRates(docs, "lang", alpha = -0.1))
    // data-cardinality stratum column fails loudly instead of collecting
    // an unbounded rate table to the driver
    intercept[IllegalArgumentException](
      Sampling.temperatureRates(docs, "doc_id", maxStrata = 2))
    assert(spark.sharedState.cacheManager.isEmpty) // even on the loud path
  }
}
