package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventAnalytics
import graft.streaming.{StreamingActiveUsers, StreamingRetention, StreamingTransition}

/** Durable twins of the incremental event artifacts: the transition
  * census/state chains and the DAU/WAU report/state chains must fold
  * batches to the full-log answers, absorb replays, and (in bucketed
  * form) rewrite only touched buckets. */
class StreamingTransitionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ev(rows: (Long, Long, String, Long)*) = {
    import spark.implicits._
    rows.toDF("event_id", "user_id", "event_type", "t")
  }

  // 40 events, 5 users, 4 types; ts strictly increasing per user so any
  // ts-cut batching is time-partitioned per user
  private def allEvents = ev((0 until 40).map { i =>
    val u = (i % 5).toLong
    val ty = Seq("view", "click", "buy", "view")(i % 4)
    (i.toLong, u, ty, i.toLong * 10L)
  }: _*)

  private def fullCounts = EventAnalytics.transitionMatrix(allEvents,
      tsUs = col("t")).select("from_type", "to_type", "n")
    .collect().map(_.toSeq).toSet

  test("global chains: folded census equals the full matrix; replays absorb") {
    val stateDir = Files.createTempDirectory("graft-st-state").toString
    val censusDir = Files.createTempDirectory("graft-st-census").toString
    val cuts = Seq(0L -> 130L, 130L -> 250L, 250L -> 9999L)
    cuts.zipWithIndex.foreach { case ((lo, hi), i) =>
      StreamingTransition.foldBatch(
        allEvents.filter(col("t") >= lo && col("t") < hi), i.toLong,
        stateDir, censusDir, df => col("t"))
    }
    val census = StreamingTransition.latestCensus(spark, censusDir).get
    assert(census.collect().map(_.toSeq).toSet === fullCounts)
    // crash replay of the last batch: recomputed from predecessors
    StreamingTransition.foldBatch(
      allEvents.filter(col("t") >= 250L), 2L, stateDir, censusDir,
      df => col("t"))
    val census2 = StreamingTransition.latestCensus(spark, censusDir).get
    assert(census2.collect().map(_.toSeq).toSet === fullCounts)
    // the state holds each user's true last event
    val st = StreamingTransition.latestState(spark, stateDir).get
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(st === Map(0L -> 350L, 1L -> 360L, 2L -> 370L, 3L -> 380L,
      4L -> 390L))
  }

  test("bucketed state: same census, only touched buckets rewritten") {
    val stateDir = Files.createTempDirectory("graft-stb-state").toString
    val censusDir = Files.createTempDirectory("graft-stb-census").toString
    StreamingTransition.foldBatchBucketed(
      allEvents.filter(col("t") < 200L), 0L, stateDir, censusDir,
      df => col("t"), numBuckets = 8)
    // batch 1 touches ONE user → at most one bucket gains a v1
    StreamingTransition.foldBatchBucketed(
      ev((100L, 2L, "buy", 1000L)), 1L, stateDir, censusDir,
      df => col("t"), numBuckets = 8)
    val root = new java.io.File(stateDir)
    val withV1 = root.listFiles().filter(_.getName.startsWith("b"))
      .count(b => new java.io.File(b, "v1").exists())
    assert(withV1 === 1)
    // fold the rest; census must equal the full matrix
    StreamingTransition.foldBatchBucketed(
      allEvents.filter(col("t") >= 200L).filter(
        !(col("user_id") === 2L)), 2L, stateDir, censusDir,
      df => col("t"), numBuckets = 8)
    // user 2's remaining events continue past the 1000-ts interleave
    StreamingTransition.foldBatchBucketed(
      allEvents.filter(col("t") >= 200L).filter(col("user_id") === 2L)
        .withColumn("t", col("t") + 2000L), 3L, stateDir, censusDir,
      df => col("t"), numBuckets = 8)
    val fullShift = EventAnalytics.transitionMatrix(
        allEvents.filter(!(col("user_id") === 2L && col("t") >= 200L))
          .unionByName(ev((100L, 2L, "buy", 1000L)))
          .unionByName(allEvents
            .filter(col("user_id") === 2L && col("t") >= 200L)
            .withColumn("t", col("t") + 2000L)),
        tsUs = col("t")).select("from_type", "to_type", "n")
      .collect().map(_.toSeq).toSet
    val census = StreamingTransition.latestCensus(spark, censusDir).get
    assert(census.collect().map(_.toSeq).toSet === fullShift)
    // replay of batch 3 is idempotent
    StreamingTransition.foldBatchBucketed(
      allEvents.filter(col("t") >= 200L).filter(col("user_id") === 2L)
        .withColumn("t", col("t") + 2000L), 3L, stateDir, censusDir,
      df => col("t"), numBuckets = 8)
    assert(StreamingTransition.latestCensus(spark, censusDir).get
      .collect().map(_.toSeq).toSet === fullShift)
  }

  test("path-census chains: folded census equals the full census; replays absorb") {
    val stateDir = Files.createTempDirectory("graft-pc-state").toString
    val censusDir = Files.createTempDirectory("graft-pc-census").toString
    val want = EventAnalytics.pathCensus(allEvents, k = 3,
        tsUs = col("t")).select("path", "n")
      .collect().map(_.toSeq).toSet
    val cuts = Seq(0L -> 130L, 130L -> 250L, 250L -> 9999L)
    cuts.zipWithIndex.foreach { case ((lo, hi), i) =>
      graft.streaming.StreamingPathCensus.foldBatch(
        allEvents.filter(col("t") >= lo && col("t") < hi), i.toLong,
        3, stateDir, censusDir, df => col("t"))
    }
    val census = graft.streaming.StreamingPathCensus
      .latestCensus(spark, censusDir).get
    assert(census.collect().map(_.toSeq).toSet === want)
    // crash replay of the last batch: recomputed from predecessors
    graft.streaming.StreamingPathCensus.foldBatch(
      allEvents.filter(col("t") >= 250L), 2L, 3, stateDir, censusDir,
      df => col("t"))
    assert(graft.streaming.StreamingPathCensus
      .latestCensus(spark, censusDir).get
      .collect().map(_.toSeq).toSet === want)
    // each user's tail holds its true last k−1 types, oldest→newest
    val st = graft.streaming.StreamingPathCensus
      .latestState(spark, stateDir).get.collect()
      .map(r => r.getAs[Long]("user_id") ->
        r.getAs[scala.collection.Seq[String]]("tail_type").toSeq).toMap
    // user 0's last two events are i=30 (30%4=2 → buy), i=35 (35%4=3 → view)
    assert(st(0L) === Seq("buy", "view"))
    assert(st.keySet === Set(0L, 1L, 2L, 3L, 4L))
  }

  test("bucketed path-census state: same census, only touched buckets rewritten") {
    val stateDir = Files.createTempDirectory("graft-pcb-state").toString
    val censusDir = Files.createTempDirectory("graft-pcb-census").toString
    graft.streaming.StreamingPathCensus.foldBatchBucketed(
      allEvents.filter(col("t") < 200L), 0L, 3, stateDir, censusDir,
      df => col("t"), numBuckets = 8)
    // batch 1 touches ONE user → at most one bucket gains a v1
    graft.streaming.StreamingPathCensus.foldBatchBucketed(
      ev((100L, 2L, "buy", 1000L)), 1L, 3, stateDir, censusDir,
      df => col("t"), numBuckets = 8)
    val root = new java.io.File(stateDir)
    val withV1 = root.listFiles().filter(_.getName.startsWith("b"))
      .count(b => new java.io.File(b, "v1").exists())
    assert(withV1 === 1)
    // fold the rest (user 2 continues past the interleave)
    graft.streaming.StreamingPathCensus.foldBatchBucketed(
      allEvents.filter(col("t") >= 200L).filter(
        !(col("user_id") === 2L)), 2L, 3, stateDir, censusDir,
      df => col("t"), numBuckets = 8)
    graft.streaming.StreamingPathCensus.foldBatchBucketed(
      allEvents.filter(col("t") >= 200L).filter(col("user_id") === 2L)
        .withColumn("t", col("t") + 2000L), 3L, 3, stateDir, censusDir,
      df => col("t"), numBuckets = 8)
    val wantShift = EventAnalytics.pathCensus(
        allEvents.filter(!(col("user_id") === 2L && col("t") >= 200L))
          .unionByName(ev((100L, 2L, "buy", 1000L)))
          .unionByName(allEvents
            .filter(col("user_id") === 2L && col("t") >= 200L)
            .withColumn("t", col("t") + 2000L)),
        k = 3, tsUs = col("t")).select("path", "n")
      .collect().map(_.toSeq).toSet
    assert(graft.streaming.StreamingPathCensus
      .latestCensus(spark, censusDir).get
      .collect().map(_.toSeq).toSet === wantShift)
    // replay of batch 3 is idempotent — census and bucketed state stable
    graft.streaming.StreamingPathCensus.foldBatchBucketed(
      allEvents.filter(col("t") >= 200L).filter(col("user_id") === 2L)
        .withColumn("t", col("t") + 2000L), 3L, 3, stateDir, censusDir,
      df => col("t"), numBuckets = 8)
    assert(graft.streaming.StreamingPathCensus
      .latestCensus(spark, censusDir).get
      .collect().map(_.toSeq).toSet === wantShift)
    val st = graft.streaming.StreamingPathCensus
      .latestStateBucketed(spark, stateDir).get.collect()
      .map(r => r.getAs[Long]("user_id") ->
        r.getAs[scala.collection.Seq[Long]]("tail_ts").toSeq).toMap
    assert(st.keySet === Set(0L, 1L, 2L, 3L, 4L))
    // user 2's tail ends at its shifted final event
    assert(st(2L).last === 2370L)
  }

  test("active-users chains: out-of-order folds upsert to the full report") {
    val d = 86400000000L
    val events = ev(
      (1L, 1L, "view", 0L), (2L, 2L, "view", 5L), // day 0
      (3L, 1L, "view", d), // day 1
      (4L, 3L, "view", 2 * d), // day 2
      (5L, 3L, "view", 9 * d)) // day 9
    val want = EventAnalytics.activeUsers(events, tsUs = col("t"),
      windowDays = 3).collect().map(_.toSeq).toSet
    val stateDir = Files.createTempDirectory("graft-au-state").toString
    val reportDir = Files.createTempDirectory("graft-au-rep").toString
    // middle slice first — the set-union state carries no ordering contract
    Seq(
      events.filter(col("t") >= d && col("t") < 3 * d),
      events.filter(col("t") < d),
      events.filter(col("t") >= 3 * d)).zipWithIndex.foreach {
      case (b, i) =>
        StreamingActiveUsers.foldBatch(b, i.toLong, stateDir, reportDir,
          df => col("t"), windowDays = 3)
    }
    val rep = StreamingActiveUsers.latestReport(spark, reportDir).get
    assert(rep.collect().map(_.toSeq).toSet === want)
    // crash replay of the last batch: recomputed from predecessors
    StreamingActiveUsers.foldBatch(events.filter(col("t") >= 3 * d), 2L,
      stateDir, reportDir, df => col("t"), windowDays = 3)
    assert(StreamingActiveUsers.latestReport(spark, reportDir).get
      .collect().map(_.toSeq).toSet === want)
  }

  test("retention chains: a late batch moves cohorts retroactively") {
    val d = 86400000000L
    val events = ev(
      (1L, 1L, "view", 0L), // u1 true cohort day 0 — arrives LAST
      (2L, 1L, "view", 2 * d),
      (3L, 2L, "view", d), (4L, 2L, "view", 2 * d),
      (5L, 3L, "view", 2 * d))
    val want = EventAnalytics.retentionCohorts(events, tsUs = col("t"))
      .collect().map(_.toSeq).toSet
    val stateDir = Files.createTempDirectory("graft-rt-state").toString
    val censusDir = Files.createTempDirectory("graft-rt-census").toString
    StreamingRetention.foldBatch(events.filter(col("t") >= d), 0L,
      stateDir, censusDir, _ => col("t"))
    StreamingRetention.foldBatch(events.filter(col("t") < d), 1L,
      stateDir, censusDir, _ => col("t"))
    val census = StreamingRetention.latestCensus(spark, censusDir).get
    assert(census.collect().map(_.toSeq).toSet === want)
    // crash replay of the late batch: recomputed from predecessors
    StreamingRetention.foldBatch(events.filter(col("t") < d), 1L,
      stateDir, censusDir, _ => col("t"))
    assert(StreamingRetention.latestCensus(spark, censusDir).get
      .collect().map(_.toSeq).toSet === want)
  }

  test("bucketed retention state: user buckets prune, census stays exact") {
    val d = 86400000000L
    val events = ev(
      (1L, 1L, "view", 0L), (2L, 1L, "view", 2 * d),
      (3L, 2L, "view", d), (4L, 2L, "view", 2 * d),
      (5L, 3L, "view", 2 * d))
    val want = EventAnalytics.retentionCohorts(events, tsUs = col("t"))
      .collect().map(_.toSeq).toSet
    val stateDir = Files.createTempDirectory("graft-rtb-state").toString
    val censusDir = Files.createTempDirectory("graft-rtb-census").toString
    StreamingRetention.foldBatchBucketed(events.filter(col("t") >= d), 0L,
      stateDir, censusDir, _ => col("t"), numBuckets = 8)
    // batch 1: ONE user's late day-0 event → one bucket gains v1, and
    // the census retracts/re-emits that user's cells
    StreamingRetention.foldBatchBucketed(events.filter(col("t") < d), 1L,
      stateDir, censusDir, _ => col("t"), numBuckets = 8)
    val root = new java.io.File(stateDir)
    val withV1 = root.listFiles().filter(_.getName.startsWith("b"))
      .count(b => new java.io.File(b, "v1").exists())
    assert(withV1 === 1)
    val census = StreamingRetention.latestCensus(spark, censusDir).get
    assert(census.collect().map(_.toSeq).toSet === want)
    // replay absorbed: no novel pairs → no bucket v2, census unchanged
    StreamingRetention.foldBatchBucketed(events.filter(col("t") < d), 2L,
      stateDir, censusDir, _ => col("t"), numBuckets = 8)
    val withV2 = root.listFiles().filter(_.getName.startsWith("b"))
      .count(b => new java.io.File(b, "v2").exists())
    assert(withV2 === 0)
    assert(StreamingRetention.latestCensus(spark, censusDir).get
      .collect().map(_.toSeq).toSet === want)
    val st = StreamingRetention.latestStateBucketed(spark, stateDir).get
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(st === Set((1L, 0L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 2L)))
  }

  test("bucketed active-users state: day buckets prune, replays absorb") {
    val d = 86400000000L
    val events = ev(
      (1L, 1L, "view", 0L), (2L, 2L, "view", 5L), // day 0
      (3L, 1L, "view", d), // day 1
      (4L, 3L, "view", 2 * d), // day 2
      (5L, 3L, "view", 40 * d)) // day 40 — far from the rest
    val want = EventAnalytics.activeUsers(events, tsUs = col("t"),
      windowDays = 3).collect().map(_.toSeq).toSet
    val stateDir = Files.createTempDirectory("graft-aub-state").toString
    val reportDir = Files.createTempDirectory("graft-aub-rep").toString
    StreamingActiveUsers.foldBatchBucketed(
      events.filter(col("t") < 3 * d), 0L, stateDir, reportDir,
      df => col("t"), windowDays = 3, numBuckets = 8)
    // batch 1: one novel pair on ONE day → at most one bucket gains v1
    StreamingActiveUsers.foldBatchBucketed(
      events.filter(col("t") >= 3 * d), 1L, stateDir, reportDir,
      df => col("t"), windowDays = 3, numBuckets = 8)
    val root = new java.io.File(stateDir)
    val withV1 = root.listFiles().filter(_.getName.startsWith("b"))
      .count(b => new java.io.File(b, "v1").exists())
    assert(withV1 === 1)
    val rep = StreamingActiveUsers.latestReport(spark, reportDir).get
    assert(rep.collect().map(_.toSeq).toSet === want)
    // replay of batch 1: no novel pairs → no bucket v2, report unchanged
    StreamingActiveUsers.foldBatchBucketed(
      events.filter(col("t") >= 3 * d), 2L, stateDir, reportDir,
      df => col("t"), windowDays = 3, numBuckets = 8)
    val withV2 = root.listFiles().filter(_.getName.startsWith("b"))
      .count(b => new java.io.File(b, "v2").exists())
    assert(withV2 === 0)
    assert(StreamingActiveUsers.latestReport(spark, reportDir).get
      .collect().map(_.toSeq).toSet === want)
    // the folded bucketed state is the full distinct (user, day) table
    val st = StreamingActiveUsers.latestStateBucketed(spark, stateDir).get
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(st === Set((1L, 0L), (2L, 0L), (1L, 1L), (3L, 2L), (3L, 40L)))
  }

  test("a STRING tie column folds: empty state derives types from the batch") {
    import spark.implicits._
    // the pre-fix wrappers built the empty state with the hardcoded LONG
    // tie type, so the very first fold of a string-tied stream died in
    // the state union with an AnalysisException
    def sev(rows: (String, Long, String, Long)*) =
      rows.toDF("event_id", "user_id", "event_type", "t")
    val b1 = sev(("e0", 1L, "view", 10L), ("e1", 1L, "click", 20L))
    val b2 = sev(("e2", 1L, "buy", 30L))
    val stateDir = Files.createTempDirectory("graft-sts-state").toString
    val censusDir = Files.createTempDirectory("graft-sts-census").toString
    StreamingTransition.foldBatch(b1, 0L, stateDir, censusDir,
      df => col("t"))
    StreamingTransition.foldBatch(b2, 1L, stateDir, censusDir,
      df => col("t"))
    val census = StreamingTransition.latestCensus(spark, censusDir).get
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(census === Map(("view", "click") -> 1L, ("click", "buy") -> 1L))
    // the path-census twin has the same contract
    val pStateDir = Files.createTempDirectory("graft-stsp-state").toString
    val pCensusDir = Files.createTempDirectory("graft-stsp-census").toString
    graft.streaming.StreamingPathCensus.foldBatch(b1, 0L, k = 2,
      stateDir = pStateDir, censusDir = pCensusDir, tsUs = df => col("t"))
    graft.streaming.StreamingPathCensus.foldBatch(b2, 1L, k = 2,
      stateDir = pStateDir, censusDir = pCensusDir, tsUs = df => col("t"))
    val paths = graft.streaming.StreamingPathCensus
      .latestCensus(spark, pCensusDir).get
      .collect().map(r => r.getAs[String]("path") -> r.getAs[Long]("n"))
      .toMap
    assert(paths === Map("view>click" -> 1L, "click>buy" -> 1L))
  }
}
