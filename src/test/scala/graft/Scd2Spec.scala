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
