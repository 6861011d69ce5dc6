package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Scd2

/** SCD2 interval build: collapse, null-safe changes, open tails, tie
  * order, and the NULL exclusions. */
class Scd2Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ch(rows: (Long, Long, Long, java.lang.Long)*) = {
    import spark.implicits._
    rows.toDF("event_id", "k", "t", "v")
  }

  private def ivs(df: org.apache.spark.sql.DataFrame) =
    Scd2.intervals(df, Seq("k"), col("t"), col("v"), "event_id")
      .collect().map(r => (r.getAs[Long]("k"),
        Option(r.getAs[java.lang.Long]("value")).map(_.longValue),
        r.getAs[Long]("valid_from_us"),
        Option(r.getAs[java.lang.Long]("valid_to_us")).map(_.longValue)))
      .toSet

  test("consecutive equal values collapse; changes chain [from, to)") {
    val out = ivs(ch(
      (1L, 1L, 10L, 5L), (2L, 1L, 20L, 5L), // collapse
      (3L, 1L, 30L, 7L), (4L, 1L, 40L, 5L))) // change, change back
    assert(out === Set(
      (1L, Some(5L), 10L, Some(30L)),
      (1L, Some(7L), 30L, Some(40L)),
      (1L, Some(5L), 40L, None))) // last interval open
  }

  test("NULL state collapses null-safely; NULL↔value are real changes") {
    val out = ivs(ch(
      (1L, 1L, 10L, null), (2L, 1L, 20L, null), // null == null: collapse
      (3L, 1L, 30L, 9L), (4L, 1L, 40L, null))) // value→null reopens
    assert(out === Set(
      (1L, None, 10L, Some(30L)),
      (1L, Some(9L), 30L, Some(40L)),
      (1L, None, 40L, None)))
  }

  test("keys version independently; equal instants resolve by tie") {
    val out = ivs(ch(
      (2L, 1L, 10L, 5L), (1L, 1L, 10L, 3L), // same instant: 1 then 2
      (9L, 2L, 10L, 8L)))
    assert(out === Set(
      (1L, Some(3L), 10L, Some(10L)), // opened and closed at the tie
      (1L, Some(5L), 10L, None),
      (2L, Some(8L), 10L, None)))
  }

  test("incremental fold ≡ full intervals; collapse keeps the original from") {
    val all = ch(
      (1L, 1L, 10L, 5L), (2L, 1L, 20L, 5L), // batch 1
      (3L, 1L, 30L, 5L), // batch 2: collapses into the open interval
      (4L, 1L, 40L, 7L), (5L, 2L, 45L, 1L), // batch 2: change; new key
      (6L, 1L, 50L, 7L)) // batch 3: collapse again
    val full = ivs(all)
    def cut(lo: Long, hi: Long) = all.filter(col("t") >= lo && col("t") < hi)
    val s0 = Scd2.emptyState(spark, Seq("k"))
    val (c1, s1) = Scd2.intervalsIncremental(cut(0L, 25L), s0, Seq("k"),
      col("t"), col("v"), "event_id")
    val (c2, s2) = Scd2.intervalsIncremental(cut(25L, 48L), s1, Seq("k"),
      col("t"), col("v"), "event_id")
    val (c3, s3) = Scd2.intervalsIncremental(cut(48L, 99L), s2, Seq("k"),
      col("t"), col("v"), "event_id")
    val folded = c1.unionByName(c2).unionByName(c3)
      .unionByName(s3.select("k", "value", "valid_from_us")
        .withColumn("valid_to_us", lit(null).cast("long")))
      .collect().map(r => (r.getAs[Long]("k"),
        Option(r.getAs[java.lang.Long]("value")).map(_.longValue),
        r.getAs[Long]("valid_from_us"),
        Option(r.getAs[java.lang.Long]("valid_to_us")).map(_.longValue)))
      .toSet
    assert(folded === full)
    // state: one row per key; the fence advanced past the collapses
    val st = s3.collect().map(r => r.getAs[Long]("k") ->
      ((r.getAs[Long]("value"), r.getAs[Long]("valid_from_us"),
        r.getAs[Long]("last_ts_us")))).toMap
    assert(st === Map(1L -> ((7L, 40L, 50L)), 2L -> ((1L, 45L, 45L))))
  }

  test("incremental: an event behind the folded tail raises loudly") {
    // the fence advances on COLLAPSED events too: t=20 collapsed into
    // the open interval, so a late t=15 arrival must still raise
    val (c1, s1) = Scd2.intervalsIncremental(
      ch((1L, 1L, 10L, 5L), (2L, 1L, 20L, 5L)),
      Scd2.emptyState(spark, Seq("k")), Seq("k"), col("t"), col("v"),
      "event_id")
    c1.collect()
    val (c2, _) = Scd2.intervalsIncremental(ch((3L, 1L, 15L, 9L)), s1,
      Seq("k"), col("t"), col("v"), "event_id")
    val e = intercept[Exception] { c2.collect() }
    assert(e.getMessage.contains("time-partitioned"))
  }

  test("NULL key/ts change events are excluded by statement") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(1L), Some(10L), 5L),
      (2L, None: Option[Long], Some(20L), 6L),
      (3L, Some(1L), None: Option[Long], 7L))
      .toDF("event_id", "k", "t", "v")
    val out = Scd2.intervals(df, Seq("k"), col("t"), col("v"), "event_id")
    assert(out.collect().map(r => r.getAs[Long]("k")).toSeq === Seq(1L))
  }
}
