package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sessionize

/** Gap-based sessionization: island boundaries, the strict-gap contract,
  * tie-breaking, and the NULL exclusions. */
class SessionizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ev(rows: (Long, Long, Long)*) = {
    import spark.implicits._
    rows.toDF("event_id", "user_id", "t")
  }

  test("silence over the gap opens a new session; equal gap does not") {
    val events = ev(
      (1L, 1L, 0L), (2L, 1L, 10L), // session 1
      (3L, 1L, 1011L), // gap 1001 > 1000 → session 2
      (4L, 1L, 2011L), // gap exactly 1000 → stays in session 2
      (5L, 2L, 0L)) // another user, own numbering
    val out = Sessionize.sessionStats(events, gapUs = 1000L,
        tsUs = col("t")).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("session_seq")) ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("start_us"),
          r.getAs[Long]("dur_us")))).toMap
    assert(out === Map(
      (1L, 1L) -> ((2L, 0L, 10L)),
      (1L, 2L) -> ((2L, 1011L, 1000L)),
      (2L, 1L) -> ((1L, 0L, 0L))))
  }

  test("equal timestamps order by the tie column — numbering is total") {
    val events = ev((9L, 1L, 5L), (3L, 1L, 5L), (7L, 1L, 5000L))
    val rows = Sessionize.withSessions(events, gapUs = 1000L,
        tsUs = col("t")).orderBy("ts_us", "event_id").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(3L, 9L, 7L))
    assert(rows.map(_.getAs[Long]("session_seq")).toSeq === Seq(1L, 1L, 2L))
  }

  test("NULL users and timestamps are excluded; bad gap fails fast") {
    import spark.implicits._
    val events = Seq(
      (1L, Some(1L), Some(10L)),
      (2L, None, Some(20L)),
      (3L, Some(1L), None))
      .toDF("event_id", "user_id", "t")
    val out = Sessionize.withSessions(events, gapUs = 1000L, tsUs = col("t"))
    assert(out.select("event_id").collect().map(_.getLong(0)).toSeq ===
      Seq(1L))
    intercept[IllegalArgumentException] {
      Sessionize.withSessions(events, gapUs = 0L, tsUs = col("t"))
    }
  }
}
