package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IntervalJoin

/** Interval-containment join: overlap multi-match, inclusive bounds,
  * grid-straddling intervals, the explosion guard, and NULL statements. */
class IntervalJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def pts(rows: (Long, Long, Long)*) = {
    import spark.implicits._
    rows.toDF("pid", "k", "t")
  }
  private def ivs(rows: (Long, Long, Long, Long)*) = {
    import spark.implicits._
    rows.toDF("ivid", "k", "s", "e")
  }

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.select("pid", "iv_ivid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("overlapping intervals each match; bounds are inclusive") {
    val out = IntervalJoin.byContainment(
      pts((1L, 1L, 50L), (2L, 1L, 100L), (3L, 1L, 150L), (4L, 1L, 300L)),
      ivs((10L, 1L, 0L, 100L), (11L, 1L, 100L, 200L), (12L, 1L, 40L, 160L)),
      Seq("k"), col("t"), col("s"), col("e"), binUs = 64L)
    assert(pairs(out) === Set(
      (1L, 10L), (1L, 12L), // 50 in [0,100] and [40,160]
      (2L, 10L), (2L, 11L), (2L, 12L), // 100 inclusive in all three
      (3L, 11L), (3L, 12L))) // 150; point 4 (300) matches nothing
  }

  test("an interval straddling many grid cells still matches once each") {
    // bin 10 → interval [5, 95] covers 10 cells; each point matches once
    val out = IntervalJoin.byContainment(
      pts((1L, 1L, 5L), (2L, 1L, 50L), (3L, 1L, 95L), (4L, 1L, 96L)),
      ivs((10L, 1L, 5L, 95L)),
      Seq("k"), col("t"), col("s"), col("e"), binUs = 10L)
    assert(pairs(out) === Set((1L, 10L), (2L, 10L), (3L, 10L)))
    assert(out.count() === 3) // exactly once each — no bin-level dupes
  }

  test("keys partition the match space") {
    val out = IntervalJoin.byContainment(
      pts((1L, 1L, 50L), (2L, 2L, 50L)),
      ivs((10L, 1L, 0L, 100L)),
      Seq("k"), col("t"), col("s"), col("e"), binUs = 64L)
    assert(pairs(out) === Set((1L, 10L)))
  }

  test("negative timestamps bin correctly (floor, not truncate-to-zero)") {
    val out = IntervalJoin.byContainment(
      pts((1L, 1L, -5L), (2L, 1L, -15L)),
      ivs((10L, 1L, -10L, -1L)),
      Seq("k"), col("t"), col("s"), col("e"), binUs = 10L)
    assert(pairs(out) === Set((1L, 10L)))
  }

  test("inverted intervals and grid blowups fail loudly") {
    val inv = IntervalJoin.byContainment(pts((1L, 1L, 5L)),
      ivs((10L, 1L, 100L, 50L)), Seq("k"), col("t"), col("s"), col("e"),
      binUs = 10L)
    assert(intercept[Exception] { inv.collect() }
      .getMessage.contains("inverted"))
    val blow = IntervalJoin.byContainment(pts((1L, 1L, 5L)),
      ivs((10L, 1L, 0L, 1000000L)), Seq("k"), col("t"), col("s"), col("e"),
      binUs = 10L, maxBinsPerInterval = 100)
    assert(intercept[Exception] { blow.collect() }
      .getMessage.contains("coarsen binUs"))
  }

  test("NULL key/ts rows on either side match nothing (inner semantics)") {
    import spark.implicits._
    val p = Seq((1L, Some(1L), Some(50L)), (2L, None: Option[Long], Some(50L)),
      (3L, Some(1L), None: Option[Long])).toDF("pid", "k", "t")
    val iv = Seq((10L, Some(1L), Some(0L), Some(100L)),
      (11L, None: Option[Long], Some(0L), Some(100L)),
      (12L, Some(1L), None: Option[Long], Some(100L)))
      .toDF("ivid", "k", "s", "e")
    val out = IntervalJoin.byContainment(p, iv, Seq("k"),
      col("t"), col("s"), col("e"), binUs = 64L)
    assert(pairs(out) === Set((1L, 10L)))
  }

  test("interval payload columns arrive prefixed; point columns survive") {
    import spark.implicits._
    val iv = Seq((10L, 1L, 0L, 100L, "exp-a")).toDF("ivid", "k", "s", "e", "tag")
    val out = IntervalJoin.byContainment(pts((1L, 1L, 50L)), iv, Seq("k"),
      col("t"), col("s"), col("e"), binUs = 64L)
    val r = out.collect()(0)
    assert(r.getAs[String]("iv_tag") === "exp-a")
    assert(r.getAs[Long]("iv_s") === 0L && r.getAs[Long]("iv_e") === 100L)
    assert(r.getAs[Long]("pid") === 1L && r.getAs[Long]("ts_us") === 50L)
  }
}
