package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventAnalytics

/** Temporal holdout and skip-gram pair mining: split boundaries, session
  * confinement, distance accounting, and the NULL exclusions. */
class SequenceMiningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ev(rows: (Long, Long, Long, String)*) = {
    import spark.implicits._
    rows.toDF("event_id", "user_id", "t", "event_type")
  }

  test("temporal holdout: last k by (ts, tie) desc are test; short users all-test") {
    val out = EventAnalytics.temporalHoldout(
      ev((1L, 1L, 10L, "a"), (2L, 1L, 20L, "a"), (3L, 1L, 30L, "a"),
        (4L, 2L, 5L, "a"), // user 2 has one event: entirely test
        (5L, 1L, 30L, "a")), // tie at 30: larger event_id is later
      k = 2, tsUs = col("t"))
      .collect().map(r => r.getAs[Long]("event_id") ->
        r.getAs[String]("split")).toMap
    assert(out === Map(1L -> "train", 2L -> "train", 3L -> "test",
      5L -> "test", 4L -> "test"))
  }

  test("skip-gram pairs stay inside a session and count by distance") {
    // one user, two sessions (gap 1000): [a b a] and [c a]
    val out = EventAnalytics.skipgramPairs(
      ev((1L, 1L, 0L, "a"), (2L, 1L, 10L, "b"), (3L, 1L, 20L, "a"),
        (4L, 1L, 5000L, "c"), (5L, 1L, 5010L, "a")),
      gapUs = 1000L, maxDist = 2, tsUs = col("t"))
      .collect().map(r => (r.getAs[String]("a"), r.getAs[String]("b"),
        r.getAs[Int]("dist")) -> r.getAs[Long]("n")).toMap
    assert(out === Map(
      ("a", "b", 1) -> 1L, ("b", "a", 1) -> 1L, ("a", "a", 2) -> 1L,
      ("c", "a", 1) -> 1L)) // never (a, c): session boundary blocks it
  }

  test("skip-gram pairs: equal timestamps order by the tie column") {
    val out = EventAnalytics.skipgramPairs(
      ev((2L, 1L, 10L, "x"), (1L, 1L, 10L, "y")),
      gapUs = 1000L, maxDist = 1, tsUs = col("t"))
      .collect().map(r => (r.getAs[String]("a"), r.getAs[String]("b")))
    assert(out.toSeq === Seq(("y", "x"))) // event 1 (y) precedes 2 (x)
  }
}
