package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventAnalytics

/** Rolling event-time features: RANGE frame edges, equal-ts peers, the
  * per-user gap, and the NULL exclusions. */
class RollingFeaturesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ev(rows: (Long, Long, Long, Long)*) = {
    import spark.implicits._
    rows.toDF("event_id", "user_id", "t", "v")
  }

  private def run(df: org.apache.spark.sql.DataFrame) =
    EventAnalytics.rollingFeatures(df, tsUs = col("t"), valueCol = col("v"),
      windows = Seq("w" -> 100L))
      .collect().map(r => r.getAs[Long]("event_id") ->
        ((r.getAs[Long]("n_w"), r.getAs[Long]("sum_w"),
          Option(r.getAs[java.lang.Long]("prev_gap_us")).map(_.longValue))))
      .toMap

  test("RANGE frame is [ts-w, ts] inclusive of both edges") {
    val out = run(ev(
      (1L, 1L, 0L, 10L), (2L, 1L, 100L, 20L), (3L, 1L, 101L, 30L),
      (4L, 1L, 300L, 40L)))
    assert(out === Map(
      1L -> ((1L, 10L, None)),
      2L -> ((2L, 30L, Some(100L))), // ts 0 is exactly ts-w: inside
      3L -> ((2L, 50L, Some(1L))), // ts 0 fell out at 101
      4L -> ((1L, 40L, Some(199L))))) // alone in its window
  }

  test("equal-timestamp peers count in BOTH rows' frames (RANGE, not ROWS)") {
    val out = run(ev((1L, 1L, 50L, 1L), (2L, 1L, 50L, 2L)))
    assert(out(1L)._1 === 2L && out(1L)._2 === 3L)
    assert(out(2L)._1 === 2L && out(2L)._2 === 3L)
    // the gap still tie-breaks deterministically: 2 follows 1 at 0us
    assert(out(1L)._3 === None && out(2L)._3 === Some(0L))
  }

  test("users never see each other; NULL user/ts rows are excluded") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(1L), Some(10L), 5L), (2L, Some(2L), Some(10L), 7L),
      (3L, None: Option[Long], Some(10L), 9L),
      (4L, Some(1L), None: Option[Long], 11L))
      .toDF("event_id", "user_id", "t", "v")
    val out = EventAnalytics.rollingFeatures(df, col("t"), col("v"),
      Seq("w" -> 100L)).collect()
    assert(out.map(_.getAs[Long]("event_id")).toSet === Set(1L, 2L))
    assert(out.forall(r => r.getAs[Long]("n_w") === 1L))
  }

  test("incremental fold ≡ full corpus; gap anchors survive long silence") {
    // user 1 goes silent far past the window — the gap anchor row must
    // survive state pruning; user 2 stays active across the cut
    val all = ev(
      (1L, 1L, 0L, 10L), (2L, 2L, 50L, 20L), (3L, 1L, 80L, 30L),
      (4L, 2L, 150L, 40L), (5L, 1L, 1000L, 50L), (6L, 2L, 1010L, 60L))
    def feats(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "n_w", "sum_w", "prev_gap_us")
        .collect().map(_.toSeq).toSet
    val full = feats(EventAnalytics.rollingFeatures(all, col("t"),
      col("v"), Seq("w" -> 100L)))
    val st0 = EventAnalytics.emptyRollingState(spark)
    val (f1, s1) = EventAnalytics.rollingFeaturesIncremental(
      all.filter(col("t") < 100L), st0, col("t"), col("v"),
      Seq("w" -> 100L))
    val (f2, s2) = EventAnalytics.rollingFeaturesIncremental(
      all.filter(col("t") >= 100L && col("t") < 500L), s1, col("t"),
      col("v"), Seq("w" -> 100L))
    val (f3, s3) = EventAnalytics.rollingFeaturesIncremental(
      all.filter(col("t") >= 500L), s2, col("t"), col("v"),
      Seq("w" -> 100L))
    assert(feats(f1.unionByName(f2).unionByName(f3)) === full)
    // the state is window-bounded plus one gap anchor per user: after
    // batch 2 (tail 150, window 100) user 1's t=80 row survives only as
    // the anchor; t=0 is gone
    val s2rows = s2.collect().map(r => (r.getAs[Long]("user_id"),
      r.getAs[Long]("ts_us"))).toSet
    assert(s2rows === Set((1L, 80L), (2L, 50L), (2L, 150L)))
  }

  test("incremental: a batch at-or-before the folded tail raises loudly") {
    val (f1, s1) = EventAnalytics.rollingFeaturesIncremental(
      ev((1L, 1L, 100L, 5L)), EventAnalytics.emptyRollingState(spark),
      col("t"), col("v"), Seq("w" -> 100L))
    f1.collect()
    val (f2, _) = EventAnalytics.rollingFeaturesIncremental(
      ev((2L, 2L, 100L, 5L)), s1, col("t"), col("v"), Seq("w" -> 100L))
    val e = intercept[Exception] { f2.collect() }
    assert(e.getMessage.contains("strictly time-partitioned"))
  }

  test("a NULL value contributes to the count but not the sum") {
    import spark.implicits._
    val df = Seq((1L, 1L, 10L, Some(5L)), (2L, 1L, 20L, None: Option[Long]))
      .toDF("event_id", "user_id", "t", "v")
    val out = EventAnalytics.rollingFeatures(df, col("t"), col("v"),
      Seq("w" -> 100L)).collect()
      .map(r => r.getAs[Long]("event_id") ->
        ((r.getAs[Long]("n_w"), r.getAs[Long]("sum_w")))).toMap
    assert(out === Map(1L -> ((1L, 5L)), 2L -> ((2L, 5L))))
  }
}
