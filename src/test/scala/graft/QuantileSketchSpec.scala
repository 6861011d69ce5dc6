package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.QuantileSketch

/** Bucket-code algebra (hand-computed codes, monotonicity, contiguity,
  * lower-bound inversion, the 1/32 error bound), additive-merge laws,
  * and rank selection against exact quantiles. */
class QuantileSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def vals(rows: (Long, String, Long)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "source", "x")
  }

  private def codeOf(xs: Long*): Seq[Long] = {
    import spark.implicits._
    xs.toDF("__x").withColumn("c", expr(QuantileSketch.sparkCode("__x")))
      .orderBy("__x").collect().map(_.getAs[Long]("c")).toSeq
  }

  private def loOf(cs: Long*): Seq[Long] = {
    import spark.implicits._
    cs.toDF("__c").withColumn("v", expr(QuantileSketch.sparkLo("__c")))
      .orderBy("__c").collect().map(_.getAs[Long]("v")).toSeq
  }

  test("hand-computed codes: exact regime, octave starts, interior") {
    // x < 32 is stored exactly
    assert(codeOf(0L, 1L, 31L) === Seq(0L, 1L, 31L))
    // x = 32: e=5, sub = 32*32/32 div... = 32 → code 32 (contiguous)
    // x = 63: still octave 5, last sub-bucket → 63
    // x = 64: e=6, first sub-bucket → 64 (width 2 from here)
    // x = 100: e=6, sub = 100*32 DIV 64 = 50 → 32*1 + 50 = 82
    assert(codeOf(32L, 63L, 64L, 100L) === Seq(32L, 63L, 64L, 82L))
    // x = 1048576 = 2^20: e=20, first sub-bucket → 32*(20-4) = 512
    assert(codeOf(1L << 20) === Seq(512L))
  }

  test("codes are monotone and reach every bucket exactly once") {
    val xs = (0L until 4096L)
    val cs = codeOf(xs: _*)
    assert(cs === cs.sorted)
    // 0..31 exact, then 32 sub-buckets per octave 5..11
    assert(cs.distinct.length === 32 + 32 * 7)
    // contiguous codes: no gaps
    assert(cs.distinct === (cs.head to cs.last))
  }

  test("lower bound inverts the code and bounds the error by 1/32") {
    val xs = Seq(0L, 7L, 31L, 32L, 33L, 63L, 64L, 100L, 999L, 4096L,
      123456L, (1L << 40) + 12345L)
    val lows = loOf(codeOf(xs: _*): _*)
    xs.sorted.zip(lows).foreach { case (x, lo) =>
      assert(lo <= x, s"lo($x) = $lo")
      // width of x's bucket ≤ max(1, lo/32)
      assert(x - lo <= math.max(1L, lo / 32L), s"x=$x lo=$lo")
    }
  }

  test("sharded merge equals single-pass census; estimates match the sketch bound") {
    val rows = (0L until 400L).map(i => (i, "s", 10L + i * 7L))
    val all = vals(rows: _*)
    val single = QuantileSketch.census(all, col("x"), Seq("source"))
    val merged = QuantileSketch.merge(
      QuantileSketch.census(all.filter(col("doc_id") % 2 === 0), col("x"), Seq("source")),
      QuantileSketch.census(all.filter(col("doc_id") % 2 === 1), col("x"), Seq("source")),
      Seq("source"))
    val m1 = single.collect().map(r =>
      r.getAs[Long]("code") -> r.getAs[Long]("n")).toMap
    val m2 = merged.collect().map(r =>
      r.getAs[Long]("code") -> r.getAs[Long]("n")).toMap
    assert(m1 === m2)

    val pcts = Seq(25, 50, 75, 90, 99)
    val est = QuantileSketch.estimates(merged, Seq("source"), pcts)
      .collect().map(r => r.getAs[Int]("pct") -> r.getAs[Long]("est")).toMap
    val exact = QuantileSketch.exactQuantiles(all, col("x"), Seq("source"), pcts)
      .collect().map(r => r.getAs[Int]("pct") -> r.getAs[Long]("exact")).toMap
    pcts.foreach { p =>
      // exact rank-r value, computed by hand from the sorted list
      val sorted = rows.map(_._3).sorted
      val r = math.max(1, (p * sorted.length + 99) / 100)
      assert(exact(p) === sorted(r - 1), s"pct $p")
      assert(est(p) <= exact(p), s"pct $p: est ${est(p)} > exact")
      assert(exact(p) - est(p) <= math.max(1L, est(p) / 32L),
        s"pct $p: est ${est(p)} vs exact ${exact(p)}")
    }
  }

  test("censusDistance: self is zero, disjoint saturates, shift registers") {
    val a = QuantileSketch.census(
      vals((1L, "s", 5L), (2L, "s", 5L), (3L, "s", 10L), (4L, "s", 200L)),
      col("x"), Seq("source"))
    def driftMap(x: org.apache.spark.sql.DataFrame,
                 y: org.apache.spark.sql.DataFrame) =
      QuantileSketch.censusDistance(x, y, Seq("source")).collect()
        .map(r => r.getAs[String]("source") ->
          (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
            r.getAs[Long]("drift_micro"))).toMap
    // identical censuses → exactly zero
    assert(driftMap(a, a)("s") === ((4L, 4L, 0L)))
    // fully disjoint value ranges → saturation: each side's floored
    // fractions sum to ~1e6, half-L1 ≈ 1e6 (floor slack only)
    val b = QuantileSketch.census(
      vals((1L, "s", 5000L), (2L, "s", 9000L)), col("x"), Seq("source"))
    val (na, nb, d) = driftMap(a, b)("s")
    assert(na === 4L && nb === 2L)
    assert(d >= 999998L && d <= 1000000L)
    // a partial shift: one of four values moved out of a shared bucket
    // → drift = 250000 (2/4 vs 2/2 on code 5; 1/4 each on 10-bucket and
    // 200-bucket... hand-fold: pa = {5:500000, 10:250000, 200-code:250000},
    // pb = {5:1000000} → |500000-1000000| + 250000 + 250000 = 1000000, /2
    val c = QuantileSketch.census(
      vals((1L, "s", 5L), (2L, "s", 5L)), col("x"), Seq("source"))
    assert(driftMap(a, c)("s")._3 === 500000L)
  }

  test("null and negative measures are dropped; p100 selects the max") {
    val df = vals((1L, "s", 5L), (2L, "s", -3L), (3L, "s", 40L))
      .union(vals((4L, "s", 0L)))
    val cen = QuantileSketch.census(df, when(col("x") >= -100, col("x")), Seq("source"))
    assert(cen.agg(sum("n")).collect().head.getLong(0) === 3L) // -3 dropped
    val ex = QuantileSketch.exactQuantiles(df, col("x"), Seq("source"), Seq(100))
      .collect().head.getAs[Long]("exact")
    assert(ex === 40L)
  }
}
