package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Dedup

/** Duplicated-span fraction (exact-substring dedup signal): positional
  * k-gram coverage against a cross-doc gram census. k=4 keeps window
  * counts hand-computable. */
class DupSpanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def statsOf(rows: Seq[(Long, String)], k: Int = 4,
                      maxFrac: Double = 0.5) = {
    import spark.implicits._
    Dedup.dupSpanStats(rows.toDF("doc_id", "text"), k = k, maxFrac = maxFrac)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))))
      .toMap
  }

  test("exact dup scores 1e6; partial prefix overlap scores its fraction") {
    val ten = (1 to 10).map(i => s"w$i").mkString(" ")
    // doc 3 shares exactly doc 1's first 4-gram (w1..w4), then diverges
    val out = statsOf(Seq(
      1L -> ten, 2L -> ten,
      3L -> ((1 to 4).map(i => s"w$i") ++ (1 to 6).map(i => s"u$i"))
        .mkString(" ")))
    // 10 words, k=4 -> 7 windows
    assert(out(1L) === ((7L, 7L, 1000000L, false)))
    assert(out(2L) === ((7L, 7L, 1000000L, false)))
    // only position 0's window is shared: floor(1e6/7) = 142857
    assert(out(3L) === ((7L, 1L, 142857L, true)))
  }

  test("intra-doc repetition alone never marks a gram duplicated") {
    val out = statsOf(Seq(
      1L -> "x1 x2 x3 x4 x1 x2 x3 x4", // window 0 == window 4
      2L -> "y1 y2 y3 y4 y5"))
    assert(out(1L) === ((5L, 0L, 0L, true)))
    assert(out(2L) === ((2L, 0L, 0L, true)))
  }

  test("short docs are one whole-doc window; empty and NULL keep with 0") {
    val out = statsOf(Seq(
      1L -> "a b", 2L -> "a b", 3L -> "c", 4L -> "", 5L -> null))
    assert(out(1L) === ((1L, 1L, 1000000L, false)))
    assert(out(2L) === ((1L, 1L, 1000000L, false)))
    assert(out(3L) === ((1L, 0L, 0L, true)))
    assert(out(4L) === ((0L, 0L, 0L, true)))
    assert(out(5L) === ((0L, 0L, 0L, true)))
  }

  test("incremental ≡ full-union restricted to the new batch; census additive") {
    import spark.implicits._
    val b1 = Seq(1L -> "a b c d e f g h i j", 2L -> "p q r s t u v w x y")
      .toDF("doc_id", "text")
    // 11 = exact dup of old doc 1 (its grams become duplicated only via
    // the old census); 12 shares two windows with old doc 2; 13 is fresh
    val b2 = Seq(11L -> "a b c d e f g h i j",
      12L -> "m n o p q r s t z z2",
      13L -> "k1 k2 k3 k4 k5 k6 k7 k8").toDF("doc_id", "text")
    val full = Dedup.dupSpanStats(b1.unionByName(b2), k = 4)
      .filter(org.apache.spark.sql.functions.col("doc_id") >= 11L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))).toMap
    val (inc, merged) = Dedup.dupSpanStatsIncremental(b2,
      Dedup.spanCensus(b1, k = 4), k = 4)
    val incM = inc.collect().map(r => r.getLong(0) -> ((r.getLong(1),
      r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(incM === full)
    assert(incM(11L) === ((7L, 7L, 1000000L, false)))
    assert(incM(12L) === ((7L, 2L, 285714L, true)))
    assert(incM(13L)._2 === 0L)
    val mergedM = merged.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val fullCensus = Dedup.spanCensus(b1.unionByName(b2), k = 4).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mergedM === fullCensus)
  }

  private def spansOf(rows: Seq[(Long, String)], k: Int = 4, gap: Int = 1) = {
    import spark.implicits._
    Dedup.maximalDupSpans(rows.toDF("doc_id", "text"), k = k,
        coalesceGap = gap)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
  }

  test("maximal spans: adjacent dup positions coalesce; a gap splits") {
    val ten = (1 to 10).map(i => s"w$i").mkString(" ")
    // doc 2 = exact dup -> both docs emit ONE whole-doc span: positions
    // 0..6 (7 windows, k=4), covering least(6+4, 10) - 0 = 10 words
    val out = spansOf(Seq(1L -> ten, 2L -> ten))
    assert(out === Set((1L, 0L, 7L, 10L), (2L, 0L, 7L, 10L)))
    // doc 3 shares doc 1's windows at positions 0 (w1..w4) and 6 (w7..w10)
    // but not in between -> two islands in BOTH docs; span at p=6 covers
    // least(6+4, 10) - 6 = 4 words
    val split = spansOf(Seq(
      1L -> ten,
      3L -> "w1 w2 w3 w4 z1 z2 w7 w8 w9 w10"))
    assert(split === Set(
      (1L, 0L, 1L, 4L), (1L, 6L, 1L, 4L),
      (3L, 0L, 1L, 4L), (3L, 6L, 1L, 4L)))
  }

  test("coalesceGap=k merges spans whose word coverage overlaps") {
    val ten = (1 to 10).map(i => s"w$i").mkString(" ")
    // positions 0 and 6 are 6 apart: separate islands at gap=1 (word
    // coverage 0..3 and 6..9 is disjoint for k=4... but at gap=6 they
    // merge into one span covering all 10 words with 2 positions)
    val merged = spansOf(Seq(
      1L -> ten,
      3L -> "w1 w2 w3 w4 z1 z2 w7 w8 w9 w10"), gap = 6)
    assert(merged === Set((1L, 0L, 2L, 10L), (3L, 0L, 2L, 10L)))
  }

  test("short-doc whole-doc window spans exactly its word count") {
    // "a b" (2 words < k) is 1 window at p=0; span_words = least(0+4, 2)
    // - 0 = 2, never more than the doc holds
    val out = spansOf(Seq(1L -> "a b", 2L -> "a b"))
    assert(out === Set((1L, 0L, 1L, 2L), (2L, 0L, 1L, 2L)))
  }

  test("undup'd docs and intra-doc repetition emit no spans") {
    val out = spansOf(Seq(
      1L -> "x1 x2 x3 x4 x1 x2 x3 x4", // self-repeat only
      2L -> "y1 y2 y3 y4 y5"))
    assert(out.isEmpty)
  }

  private def cutOf(rows: Seq[(Long, String)], k: Int = 4) = {
    import spark.implicits._
    Dedup.cutDupSpans(rows.toDF("doc_id", "text"), k = k)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))))
      .toMap
  }

  test("cut: exact dups cut to empty; a shared prefix cuts off both docs") {
    val ten = (1 to 10).map(i => s"w$i").mkString(" ")
    val out = cutOf(Seq(
      1L -> ten, 2L -> ten,
      // shares w1..w4 with doc 1 (one dup position), then diverges
      3L -> ((1 to 4).map(i => s"w$i") ++ (1 to 6).map(i => s"u$i"))
        .mkString(" ")))
    // whole-doc coverage cuts to ""
    assert(out(1L) === (("", 10L, 10L, 1L, 10L)))
    assert(out(2L) === (("", 10L, 10L, 1L, 10L)))
    // doc 3: position 0 duplicated -> cut words 0..3, keep u1..u6
    assert(out(3L) === (("u1 u2 u3 u4 u5 u6", 10L, 4L, 1L, 4L)))
  }

  test("cut: overlapping coverage merges into one disjoint cut interval") {
    val ten = (1 to 10).map(i => s"w$i").mkString(" ")
    // doc 3 shares positions 0 and 3 with doc 1 (w1..w4, w4..w7): their
    // coverage overlaps at w4 -> ONE merged span of words 0..6, keep the
    // tail z8 z9 z10... doc 3 = w1 w2 w3 w4 w5 w6 w7 z8 z9 z10
    val out = cutOf(Seq(
      1L -> ten,
      3L -> ("w1 w2 w3 w4 w5 w6 w7 z8 z9 z10")))
    assert(out(3L)._1 === "z8 z9 z10")
    assert(out(3L)._4 === 1L) // one merged span, not two
    assert(out(3L)._3 === 7L) // cut_words exact: positions 0..6
    // doc 1 loses its first 7 words symmetrically
    assert(out(1L)._1 === "w8 w9 w10")
  }

  test("cut: untouched, empty, and NULL docs pass through with zero stats") {
    val out = cutOf(Seq(
      1L -> "a b c d e", 2L -> "", 3L -> null))
    assert(out(1L) === (("a b c d e", 5L, 0L, 0L, 0L)))
    assert(out(2L) === (("", 0L, 0L, 0L, 0L)))
    assert(out(3L) === (("", 0L, 0L, 0L, 0L)))
  }

  test("incremental cut ≡ full-union cut restricted to the new batch") {
    import spark.implicits._
    val b1 = Seq(1L -> "a b c d e f g h i j", 2L -> "p q r s t u v w x y")
      .toDF("doc_id", "text")
    // 11 = exact dup of old 1 (cut to empty only via the old census);
    // 12 shares old 2's first window; 13 is fresh
    val b2 = Seq(11L -> "a b c d e f g h i j",
      12L -> "p q r s z1 z2 z3 z4",
      13L -> "k1 k2 k3 k4 k5 k6").toDF("doc_id", "text")
    val full = Dedup.cutDupSpans(b1.unionByName(b2), k = 4)
      .filter(org.apache.spark.sql.functions.col("doc_id") >= 11L)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val (inc, merged) = Dedup.cutDupSpansIncremental(b2,
      Dedup.spanCensus(b1, k = 4), k = 4)
    val incM = inc.collect().map(r => r.getLong(0) -> ((r.getString(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(incM === full)
    assert(incM(11L)._1 === "")                    // cut whole vs old dup
    assert(incM(12L)._1 === "z1 z2 z3 z4")         // prefix span cut
    assert(incM(13L) === (("k1 k2 k3 k4 k5 k6", 6L, 0L, 0L, 0L)))
    val mergedM = merged.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val fullCensus = Dedup.spanCensus(b1.unionByName(b2), k = 4).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mergedM === fullCensus)
  }

  private def intraOf(rows: Seq[(Long, String)], k: Int = 4) = {
    import spark.implicits._
    Dedup.intraDocDedup(rows.toDF("doc_id", "text"), k = k)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))))
      .toMap
  }

  test("intra-doc dedup keeps the first occurrence of a repeated span") {
    val out = intraOf(Seq(
      // two identical halves: window p4 repeats window p0 -> cut words
      // 4..7, keep the first half
      1L -> "x1 x2 x3 x4 x1 x2 x3 x4",
      // an all-identical doc keeps exactly one word: windows p1, p2
      // repeat p0 -> island [1,2] covers words 1..5
      2L -> "a a a a a a"))
    assert(out(1L) === (("x1 x2 x3 x4", 8L, 4L, 1L, 4L)))
    assert(out(2L) === (("a", 6L, 5L, 1L, 5L)))
  }

  test("intra-doc dedup never marks cross-doc duplication") {
    // exact dups of each other, but no self-repeat: both pass untouched
    val ten = (1 to 10).map(i => s"w$i").mkString(" ")
    val out = intraOf(Seq(1L -> ten, 2L -> ten))
    assert(out(1L) === ((ten, 10L, 0L, 0L, 0L)))
    assert(out(2L) === ((ten, 10L, 0L, 0L, 0L)))
  }

  test("maxFrac gates: a half-covered doc keeps strictly under the bar") {
    // 5 words, k=4 -> 2 windows; doc 2 shares window 0 only -> 500000,
    // NOT < 500000 -> dropped; with maxFrac=0.6 it keeps
    val out = statsOf(Seq(
      1L -> "a b c d e",
      2L -> "a b c d x"))
    assert(out(2L) === ((2L, 1L, 500000L, false)))
    val loose = statsOf(Seq(
      1L -> "a b c d e",
      2L -> "a b c d x"), maxFrac = 0.6)
    assert(loose(2L)._4 === true)
  }
}
