package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventAnalytics

/** Funnel ordering semantics and the retention triangle on hand-built
  * event streams. */
class EventAnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ev(rows: (Long, Long, String, Long)*) = {
    import spark.implicits._
    rows.toDF("event_id", "user_id", "event_type", "t")
  }

  test("a step only counts when it follows the previous step in time") {
    val events = ev(
      (1L, 1L, "view", 0L), (2L, 1L, "click", 10L), // full path
      (3L, 2L, "click", 0L), (4L, 2L, "view", 10L), // click BEFORE view
      (5L, 3L, "view", 5L), // view only
      (6L, 2L, "click", 20L)) // user 2 recovers: click after view
    val out = EventAnalytics.funnel(events, Seq("view", "click"),
        tsUs = col("t")).collect()
      .map(r => r.getAs[Long]("step_idx") ->
        ((r.getAs[Long]("n_users"), r.getAs[Long]("conv_total_micro"),
          r.getAs[Long]("conv_step_micro")))).toMap
    assert(out(0L) === ((3L, 1000000L, 1000000L)))
    assert(out(1L) === ((2L, 666666L, 666666L)))
  }

  test("an equal-timestamp step counts (at-or-after convention)") {
    val events = ev((1L, 1L, "view", 7L), (2L, 1L, "click", 7L))
    val out = EventAnalytics.funnel(events, Seq("view", "click"),
      tsUs = col("t")).collect()
    assert(out.map(_.getAs[Long]("n_users")).toSeq === Seq(1L, 1L))
  }

  test("the conversion window bounds each step, inclusively") {
    val events = ev(
      (1L, 1L, "view", 0L), (2L, 1L, "click", 100L), // inside window
      (3L, 2L, "view", 0L), (4L, 2L, "click", 101L), // one past it
      (5L, 3L, "view", 0L), (6L, 3L, "click", 150L), // first try late...
      (7L, 3L, "click", 50L)) // ...but an earlier click rescues
    val out = EventAnalytics.funnel(events, Seq("view", "click"),
        tsUs = col("t"), withinUs = Some(100L)).collect()
      .map(r => r.getAs[Long]("step_idx") -> r.getAs[Long]("n_users")).toMap
    assert(out === Map(0L -> 3L, 1L -> 2L))
    intercept[IllegalArgumentException] {
      EventAnalytics.funnel(events, Seq("view"), tsUs = col("t"),
        withinUs = Some(0L))
    }
  }

  test("duplicate step names fail fast") {
    intercept[IllegalArgumentException] {
      EventAnalytics.funnel(ev(), Seq("view", "view"), tsUs = col("t"))
    }
  }

  test("transition matrix: per-user consecutive pairs with exact shares") {
    import org.apache.spark.sql.functions.col
    val events = ev(
      (1L, 1L, "view", 0L), (2L, 1L, "click", 10L), (3L, 1L, "view", 20L),
      (4L, 2L, "view", 0L), (5L, 2L, "buy", 10L))
    // pairs: view→click, click→view, view→buy; no cross-user pair
    val out = graft.operators.EventAnalytics.transitionMatrix(events,
        tsUs = col("t")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("share_micro")))).toMap
    assert(out === Map(
      ("view", "click") -> ((1L, 500000L)),
      ("view", "buy") -> ((1L, 500000L)),
      ("click", "view") -> ((1L, 1000000L))))
  }

  test("incremental transitions: boundary pairs stitch, deltas sum to the batch answer") {
    import org.apache.spark.sql.functions.col
    val E = graft.operators.EventAnalytics
    val all = ev(
      (1L, 1L, "view", 0L), (2L, 1L, "click", 10L),
      (3L, 1L, "view", 30L), // crosses the cut: click→view is a boundary pair
      (4L, 2L, "view", 5L), (5L, 2L, "buy", 40L))
    val full = E.transitionMatrix(all, tsUs = col("t"))
      .collect().map(_.toSeq).toSet
    val (d1, s1) = E.transitionMatrixIncremental(
      all.filter(col("t") < 20L), E.emptyTransitionState(spark),
      tsUs = col("t"))
    val (d2, _) = E.transitionMatrixIncremental(
      all.filter(col("t") >= 20L), s1, tsUs = col("t"))
    val merged = E.mergeTransitionCounts(d1, d2)
    val totals = merged.groupBy(col("from_type"))
      .agg(org.apache.spark.sql.functions.sum(col("n")).as("__t"))
    val inc = merged.join(totals, Seq("from_type"))
      .withColumn("share_micro",
        org.apache.spark.sql.functions.expr(
          "n * 1000000L DIV greatest(__t, 1L)"))
      .select(col("from_type"), col("to_type"), col("n"),
        col("share_micro"))
      .collect().map(_.toSeq).toSet
    assert(inc === full)
    // out-of-order batch fails loudly
    val (_, s2) = E.transitionMatrixIncremental(
      ev((9L, 9L, "view", 100L)), E.emptyTransitionState(spark),
      tsUs = col("t"))
    val (d3, _) = E.transitionMatrixIncremental(
      ev((10L, 9L, "view", 50L)), s2, tsUs = col("t"))
    val err = intercept[Exception] { d3.collect() }
    assert(err.getMessage.contains("time-partitioned"))
    // a boundary ts TIE whose event_id orders the batch event AFTER the
    // persisted one is a legal split and pairs through the state …
    val (d4, _) = E.transitionMatrixIncremental(
      ev((11L, 9L, "click", 100L)), s2, tsUs = col("t"))
    val ok = d4.collect().map(r => (r.getString(0), r.getString(1),
      r.getLong(2))).toSet
    assert(ok === Set(("view", "click", 1L)))
    // … but one whose event_id orders it BEFORE would reorder the full
    // window's (ts, tie) sort and must raise, not silently mis-pair
    val (d5, _) = E.transitionMatrixIncremental(
      ev((3L, 9L, "click", 100L)), s2, tsUs = col("t"))
    val err2 = intercept[Exception] { d5.collect() }
    assert(err2.getMessage.contains("time-partitioned"))
    // an EXACTLY duplicated (ts, tie) raises too: the full window's
    // order of exact duplicates is nondeterministic, so the
    // incremental/full identity cannot be guaranteed for that input
    val (d6, _) = E.transitionMatrixIncremental(
      ev((9L, 9L, "click", 100L)), s2, tsUs = col("t"))
    val err3 = intercept[Exception] { d6.collect() }
    assert(err3.getMessage.contains("time-partitioned"))
  }

  test("path census: k-runs stay within a user and count exactly") {
    import org.apache.spark.sql.functions.col
    val events = ev(
      (1L, 1L, "a", 0L), (2L, 1L, "b", 10L), (3L, 1L, "c", 20L),
      (4L, 1L, "b", 30L), // u1 runs: a>b>c, b>c>b
      (5L, 2L, "a", 0L), (6L, 2L, "b", 10L)) // too short for k=3
    val out = graft.operators.EventAnalytics.pathCensus(events, k = 3,
        tsUs = col("t")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out === Map(
      "a>b>c" -> ((1L, 500000L)),
      "b>c>b" -> ((1L, 500000L))))
    intercept[IllegalArgumentException] {
      graft.operators.EventAnalytics.pathCensus(events, k = 1,
        tsUs = col("t"))
    }
  }

  test("incremental path census: tails stitch boundary runs, deltas sum to the full census") {
    val E = graft.operators.EventAnalytics
    val all = ev(
      // u1: a b | c d  — runs a>b>c (2 carried) and b>c>d (1 carried)
      (1L, 1L, "a", 0L), (2L, 1L, "b", 10L),
      (3L, 1L, "c", 30L), (4L, 1L, "d", 40L),
      // u2: a | b | c — one event per batch, the tail re-folds twice
      (5L, 2L, "a", 0L), (6L, 2L, "b", 25L), (7L, 2L, "c", 45L),
      // u3: too short for k=3, contributes nothing but carries a tail
      (8L, 3L, "a", 5L))
    val full = E.pathCensus(all, k = 3, tsUs = col("t"))
      .collect().map(_.toSeq).toSet
    val (d1, s1) = E.pathCensusIncremental(all.filter(col("t") < 20L),
      E.emptyPathState(spark), k = 3, tsUs = col("t"))
    val (d2, s2) = E.pathCensusIncremental(
      all.filter(col("t") >= 20L && col("t") < 40L), s1, k = 3,
      tsUs = col("t"))
    val (d3, s3) = E.pathCensusIncremental(all.filter(col("t") >= 40L),
      s2, k = 3, tsUs = col("t"))
    val inc = E.pathReportFromCounts(E.mergePathCounts(
      E.mergePathCounts(d1, d2), d3)).collect().map(_.toSeq).toSet
    assert(inc === full)
    // the tail holds the last k−1 events oldest→newest, short for u3
    val tails = s3.collect()
      .map(r => r.getAs[Long]("user_id") ->
        r.getAs[scala.collection.Seq[String]]("tail_type").toSeq).toMap
    assert(tails === Map(1L -> Seq("c", "d"), 2L -> Seq("b", "c"),
      3L -> Seq("a")))
    // out-of-order and exactly duplicated boundary (ts, tie) both raise
    val (_, sx) = E.pathCensusIncremental(ev((9L, 9L, "a", 100L)),
      E.emptyPathState(spark), k = 3, tsUs = col("t"))
    val (dBad, _) = E.pathCensusIncremental(ev((10L, 9L, "b", 50L)), sx,
      k = 3, tsUs = col("t"))
    assert(intercept[Exception] { dBad.collect() }
      .getMessage.contains("time-partitioned"))
    val (dDup, _) = E.pathCensusIncremental(ev((9L, 9L, "b", 100L)), sx,
      k = 3, tsUs = col("t"))
    assert(intercept[Exception] { dDup.collect() }
      .getMessage.contains("time-partitioned"))
    // a later tie at the same ts is a legal split and stitches normally
    val (dTie, _) = E.pathCensusIncremental(
      ev((10L, 9L, "b", 100L), (11L, 9L, "c", 110L)), sx, k = 3,
      tsUs = col("t"))
    assert(dTie.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      === Set(("a>b>c", 1L)))
  }

  test("active users: the trailing window counts distinct supporters once") {
    import org.apache.spark.sql.functions.col
    val d = 86400000000L
    val events = ev(
      (1L, 1L, "view", 0L), (2L, 1L, "view", 10L), // u1 day 0 (once)
      (3L, 2L, "view", 0L), // u2 day 0
      (4L, 1L, "view", d), // u1 day 1
      (5L, 3L, "view", 9 * d)) // u3 day 9 — outside day 1's window
    val out = graft.operators.EventAnalytics.activeUsers(events,
        tsUs = col("t"), windowDays = 7).collect()
      .map(r => r.getAs[Long]("day") ->
        ((r.getAs[Long]("dau"), r.getAs[Long]("wau"),
          r.getAs[Long]("stickiness_micro")))).toMap
    assert(out(0L) === ((2L, 2L, 1000000L)))
    assert(out(1L) === ((1L, 2L, 500000L))) // u1 active, u2 still in window
    assert(out(9L) === ((1L, 1L, 1000000L)))
  }

  test("incremental active users: out-of-order folds upsert to the full report") {
    import org.apache.spark.sql.functions.col
    val E = graft.operators.EventAnalytics
    val d = 86400000000L
    val all = ev(
      (1L, 1L, "view", 0L), (2L, 1L, "view", 10L), // u1 day 0 (dup pair)
      (3L, 2L, "view", 0L), // u2 day 0
      (4L, 1L, "view", d), // u1 day 1
      (5L, 3L, "view", 2 * d), // u3 day 2
      (6L, 3L, "view", 9 * d)) // u3 day 9
    val full = E.activeUsers(all, tsUs = col("t"), windowDays = 3)
      .collect().map(_.toSeq).toSet
    // fold middle, then earliest, then latest — set union is order-free
    val slices = Seq(
      all.filter(col("t") >= d && col("t") < 3 * d),
      all.filter(col("t") < d),
      all.filter(col("t") >= 3 * d))
    val (report, state) = slices.foldLeft(
      (E.activeUsers(all.limit(0), tsUs = col("t"), windowDays = 3),
        E.emptyActiveState(spark))) { case ((rep, st), batch) =>
      val (delta, st2) = E.activeUsersIncremental(batch, st, col("t"),
        windowDays = 3)
      (E.mergeActiveReport(rep, delta), st2)
    }
    assert(report.collect().map(_.toSeq).toSet === full)
    // the folded state is exactly the distinct (user, day) table
    assert(state.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((1L, 0L), (2L, 0L), (1L, 1L), (3L, 2L), (3L, 9L)))
    // a replayed (duplicate) batch is absorbed: no novel pairs, empty delta
    val (dDup, stDup) = E.activeUsersIncremental(slices.head, state,
      col("t"), windowDays = 3)
    assert(dDup.count() === 0L)
    assert(stDup.count() === state.count())
  }

  test("incremental funnel: state folds to the full chain, strictness raises") {
    import org.apache.spark.sql.functions.col
    val E = graft.operators.EventAnalytics
    val steps = Seq("view", "click", "buy")
    val all = ev(
      (1L, 1L, "view", 0L), (2L, 1L, "click", 10L), // u1 completes 2
      (3L, 2L, "click", 5L), // u2: click BEFORE view — never step 1
      (4L, 2L, "view", 20L), (5L, 2L, "click", 30L), // u2 recovers
      (6L, 1L, "buy", 40L), // u1 completes 3 — in batch 2
      (7L, 3L, "view", 50L)) // u3 step 0 only
    val full = E.funnel(all, steps, tsUs = col("t"))
      .collect().map(_.toSeq).toSet
    val st1 = E.funnelIncremental(all.filter(col("t") < 25L),
      E.emptyFunnelState(spark, 3), steps, col("t"))
    val st2 = E.funnelIncremental(all.filter(col("t") >= 25L), st1,
      steps, col("t"))
    val inc = E.funnelReportFromState(st2, steps)
      .collect().map(_.toSeq).toSet
    assert(inc === full)
    // the window arm folds identically
    val fullW = E.funnel(all, steps, tsUs = col("t"),
      withinUs = Some(15L)).collect().map(_.toSeq).toSet
    val w1 = E.funnelIncremental(all.filter(col("t") < 25L),
      E.emptyFunnelState(spark, 3), steps, col("t"), Some(15L))
    val w2 = E.funnelIncremental(all.filter(col("t") >= 25L), w1,
      steps, col("t"), Some(15L))
    assert(E.funnelReportFromState(w2, steps)
      .collect().map(_.toSeq).toSet === fullW)
    // an equal-ts batch event violates the STRICT contract (the >= tie
    // convention would make it retroactively eligible) and raises
    val dup = E.funnelIncremental(ev((8L, 1L, "buy", 40L)), st2, steps,
      col("t"))
    val err = intercept[Exception] { dup.collect() }
    assert(err.getMessage.contains("strictly"))
  }

  test("incremental retention: retroactive cohort moves retract and re-emit") {
    import org.apache.spark.sql.functions.col
    val E = graft.operators.EventAnalytics
    val d = 86400000000L
    val all = ev(
      (1L, 1L, "view", 0L), // u1 day 0 (true cohort)
      (2L, 1L, "view", 2 * d), // u1 day 2
      (3L, 2L, "view", d), // u2 cohort day 1
      (4L, 2L, "view", 2 * d), // u2 day 2
      (5L, 3L, "view", 2 * d)) // u3 cohort day 2
    val full = E.retentionCohorts(all, tsUs = col("t"))
      .collect().map(_.toSeq).toSet
    // fold days ≥ 1 FIRST: u1's provisional cohort is day 2; the day-0
    // batch then moves it retroactively (retract + re-emit)
    val (d1, s1) = E.retentionCohortsIncremental(
      all.filter(col("t") >= d), E.emptyActiveState(spark), col("t"))
    val (d2, s2) = E.retentionCohortsIncremental(
      all.filter(col("t") < d), s1, col("t"))
    val merged = E.mergeRetentionCells(d1, d2)
    assert(merged.collect().map(_.toSeq).toSet === full)
    // the second delta carries a retraction: u1's old (2, 0) cell dies
    val d2cells = d2.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(d2cells((2L, 0L)) === -1L)
    // a replayed batch is absorbed: no novel pairs, empty delta
    val (dDup, _) = E.retentionCohortsIncremental(
      all.filter(col("t") < d), s2, col("t"))
    assert(dDup.count() === 0L)
  }

  test("retention triangle: cohort by first day, offsets count distinct days") {
    val d = 86400000000L
    val events = ev(
      (1L, 1L, "view", 0L), (2L, 1L, "view", 10L), // day 0 twice → once
      (3L, 1L, "click", 2 * d), // day 2
      (4L, 2L, "view", d), // cohort day 1
      (5L, 2L, "view", 2 * d + 5L)) // day 2 → offset 1
    val out = EventAnalytics.retentionCohorts(events, tsUs = col("t"))
      .collect()
      .map(r => (r.getAs[Long]("cohort_day"), r.getAs[Long]("offset_days")) ->
        r.getAs[Long]("n_users")).toMap
    assert(out === Map(
      (0L, 0L) -> 1L, (0L, 2L) -> 1L,
      (1L, 0L) -> 1L, (1L, 1L) -> 1L))
  }
}
