package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Dedup

/** Multi-probe SimHash must be a pure recall repair: a superset of the
  * single-probe pairs (probe 0 is the identity rotation), degenerate to
  * exactly the single-probe answer at probes = 1, and actually RECOVER
  * prefix-split near-dups on a fixture that has them. */
class SimhashMultiProbeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Near-dup-rich fixture: each base doc gets an exact copy (+1000) and
    * a truncated variant (+2000) — the q60 shape, small enough to
    * enumerate. */
  private def fixture: DataFrame = {
    import spark.implicits._
    val base = (0 until 40).map { i =>
      val words = (0 until 30).map(j => s"w${(i * 31 + j * 7) % 97}")
      (i.toLong, words.mkString(" "))
    }
    val dups = base.map { case (id, t) => (id + 1000L, t) }
    val vars = base.map { case (id, t) =>
      (id + 2000L, t.split(" ").dropRight(6).mkString(" "))
    }
    (base ++ dups ++ vars).toDF("doc_id", "text")
  }

  private def pairs(df: DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("multi-probe is a superset of single-probe and equals it at probes=1") {
    val docs = fixture
    val single = pairs(Dedup.simhashNearDupPairs(docs, maxHamming = 6))
    val multi = pairs(Dedup.multiProbeSimhashPairs(docs, maxHamming = 6,
      probes = 4))
    val one = pairs(Dedup.multiProbeSimhashPairs(docs, maxHamming = 6,
      probes = 1))
    assert(single.subsetOf(multi))
    assert(one == single)
  }

  test("rotated probes recover prefix-split pairs single-probe misses") {
    val docs = fixture
    // ground truth: ALL pairs at hamming <= 6 (tiny fixture — the
    // all-pairs join is affordable here and ONLY here)
    val fp = Dedup.withSimhash(docs)
      .select(col("doc_id"), col("simhash"))
    val truth = pairs(fp.alias("a").join(fp.alias("b"),
        col("a.doc_id") < col("b.doc_id"))
      .withColumn("hamming",
        expr("bit_count(a.simhash ^ b.simhash)").cast("long"))
      .filter(col("hamming") <= 6)
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        col("hamming")))
    val single = pairs(Dedup.simhashNearDupPairs(docs, maxHamming = 6))
    val multi = pairs(Dedup.multiProbeSimhashPairs(docs, maxHamming = 6,
      probes = 4))
    // the fixture must actually EXERCISE the trade: single-probe misses
    // some true pair, and multi-probe recovers at least one miss
    assert((truth -- single).nonEmpty,
      "fixture has no prefix-split pair — weaken nothing, fix the fixture")
    assert(multi.subsetOf(truth))
    assert((multi -- single).nonEmpty)
    assert(multi.size > single.size)
  }
}
