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

  test("incremental: merge, close, renumber, and untouched carryover") {
    import org.apache.spark.sql.functions.col
    val spark0 = spark
    // fold 1: user 1 two sessions, user 2 one — last per user stays open
    val (c1, s1) = graft.operators.Sessionize.sessionStatsIncremental(
      ev((1L, 1L, 0L), (2L, 1L, 5000L), (3L, 2L, 100L)), // gap 1000
      graft.operators.Sessionize.emptySessionState(spark0),
      gapUs = 1000L, tsUs = col("t"))
    assert(c1.collect().map(r => (r.getLong(0), r.getAs[Long]("session_seq")))
      .toSet === Set((1L, 1L)))
    // fold 2: user 1 continues the open session (gap 500 ≤ 1000) then
    // opens another; user 2 untouched; user 3 appears
    val (c2, s2) = graft.operators.Sessionize.sessionStatsIncremental(
      ev((4L, 1L, 5500L), (5L, 1L, 9000L), (6L, 3L, 0L)), s1,
      gapUs = 1000L, tsUs = col("t"))
    val closed2 = c2.collect().map(r => (r.getLong(0),
      r.getAs[Long]("session_seq"), r.getAs[Long]("n_events"),
      r.getAs[Long]("start_us"), r.getAs[Long]("end_us"))).toSet
    // the merged session closes (absorbed open: events 2+4, 5000..5500)
    assert(closed2 === Set((1L, 2L, 2L, 5000L, 5500L)))
    val state2 = s2.collect().map(r => (r.getLong(0),
      r.getAs[Long]("session_seq"), r.getAs[Long]("n_events"))).toSet
    assert(state2 === Set((1L, 3L, 1L), (2L, 1L, 1L), (3L, 1L, 1L)))
  }

  test("incremental fold identity: closed ∪ state ≡ full-batch sessions") {
    import org.apache.spark.sql.functions.col
    // pseudo-random but deterministic event set over 5 users
    val rows = (0L until 200L).map { i =>
      (i, i % 5L, (i * 7919L) % 100000L)
    }
    val all = ev(rows: _*)
    val full = Sessionize.sessionStats(all, gapUs = 3000L, tsUs = col("t"))
      .collect().map(_.toSeq).toSet
    val cut = 50000L
    val (c1, s1) = Sessionize.sessionStatsIncremental(
      all.filter(col("t") < cut),
      Sessionize.emptySessionState(spark), gapUs = 3000L, tsUs = col("t"))
    val (c2, s2) = Sessionize.sessionStatsIncremental(
      all.filter(col("t") >= cut), s1, gapUs = 3000L, tsUs = col("t"))
    val inc = c1.unionByName(c2).unionByName(s2)
      .collect().map(_.toSeq).toSet
    assert(inc === full)
  }

  test("a batch event before the open-session end fails loudly") {
    import org.apache.spark.sql.functions.col
    val (_, s1) = Sessionize.sessionStatsIncremental(
      ev((1L, 1L, 5000L)), Sessionize.emptySessionState(spark),
      gapUs = 1000L, tsUs = col("t"))
    val (c2, s2) = Sessionize.sessionStatsIncremental(
      ev((2L, 1L, 100L)), s1, gapUs = 1000L, tsUs = col("t"))
    val e = intercept[Exception] { s2.collect() }
    assert(e.getMessage.contains("time-partitioned"))
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
