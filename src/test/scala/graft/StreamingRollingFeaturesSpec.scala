package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventAnalytics
import graft.streaming.StreamingRollingFeatures

/** The streaming rolling-features twin: featurized rows over the
  * stream's lifetime equal the one-shot pass, kill + resume neither
  * drops nor double-ships, and the bucketed state only rewrites touched
  * buckets. */
class StreamingRollingFeaturesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val wins = Seq("w" -> 100L)
  private val batch1 = Seq((1L, 1L, 0L, 10L), (2L, 2L, 50L, 20L),
    (3L, 1L, 80L, 30L))
  private val batch2 = Seq((4L, 2L, 150L, 40L))
  private val batch3 = Seq((5L, 1L, 1000L, 50L), (6L, 2L, 1010L, 60L))

  private def df(rows: Seq[(Long, Long, Long, Long)]) =
    rows.toDF("event_id", "user_id", "t", "v")

  private def oneShot =
    EventAnalytics.rollingFeatures(df(batch1 ++ batch2 ++ batch3),
        col("t"), col("v"), wins)
      .select("event_id", "n_w", "sum_w", "prev_gap_us")
      .collect().map(_.toSeq).toSet

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("featurized rows over the stream equal the one-shot pass") {
    implicit val sqlCtx = spark.sqlContext
    val stateDir = tmp("graft-roll-state")
    val ckpt = tmp("graft-roll-ckpt")
    val outDir = tmp("graft-roll-out")
    val src = MemoryStream[(Long, Long, Long, Long)]
    val q = StreamingRollingFeatures.start(
      src.toDF().toDF("event_id", "user_id", "t", "v"), stateDir, ckpt,
      tsUs = _ => col("t"), valueCol = _ => col("v"), windows = wins,
      onFeatures = (f, batchId) => f.write.mode("overwrite")
        .parquet(s"$outDir/b$batchId"),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    Seq(batch1, batch2, batch3).foreach { b =>
      src.addData(b)
      q.processAllAvailable()
    }
    q.stop()
    val out = spark.read.parquet(s"$outDir/b*")
      .select("event_id", "n_w", "sum_w", "prev_gap_us")
    assert(out.collect().map(_.toSeq).toSet === oneShot)
    // state: window of the tail (1010) plus the gap anchors
    val st = StreamingRollingFeatures.latestState(spark, stateDir).get
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[Long]("ts_us"))).toSet
    assert(st === Set((1L, 1000L), (2L, 1010L)))
  }

  test("kill + resume: the replayed batch neither drops nor double-ships") {
    implicit val sqlCtx = spark.sqlContext
    val stateDir = tmp("graft-roll-state2")
    val ckpt = tmp("graft-roll-ckpt2")
    val outDir = tmp("graft-roll-out2")
    def run(data: Seq[Seq[(Long, Long, Long, Long)]]): Unit = {
      val src = MemoryStream[(Long, Long, Long, Long)]
      data.foreach(src.addData(_))
      val q = StreamingRollingFeatures.start(
        src.toDF().toDF("event_id", "user_id", "t", "v"), stateDir, ckpt,
        tsUs = _ => col("t"), valueCol = _ => col("v"), windows = wins,
        onFeatures = (f, batchId) => f.write.mode("overwrite")
          .parquet(s"$outDir/b$batchId"))
      q.processAllAvailable()
      q.stop()
    }
    run(Seq(batch1))
    run(Seq(batch1, batch2, batch3))
    val out = spark.read.parquet(s"$outDir/b*")
      .select("event_id", "n_w", "sum_w", "prev_gap_us")
    assert(out.collect().map(_.toSeq).toSet === oneShot)
  }

  test("bucketed state: identity holds, only touched buckets rewrite") {
    val stateDir = tmp("graft-roll-bkt")
    val out = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
    def fold(rows: Seq[(Long, Long, Long, Long)], batchId: Long): Unit =
      StreamingRollingFeatures.foldBatchBucketed(df(rows), batchId,
        stateDir, tsUs = _ => col("t"), valueCol = _ => col("v"),
        windows = wins, numBuckets = 8,
        onFeatures = (f, _) => out ++= f
          .select("event_id", "n_w", "sum_w", "prev_gap_us")
          .collect().map(_.toSeq))
    fold(batch1, 0L)
    // a batch touching ONLY user 9 commits exactly one bucket version
    fold(Seq((7L, 9L, 90L, 5L)), 1L)
    val bucketDirs = new java.io.File(stateDir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("b"))
    assert(bucketDirs.count(d => new java.io.File(d, "v1").exists()) === 1)
    fold(batch2, 2L)
    fold(batch2, 2L) // crash replay: recomputes, never regresses
    fold(batch3, 3L)
    val dedup = out.groupBy(_.head).map(_._2.head).toSet
    assert(dedup.filterNot(_.head == 7L) === oneShot)
    val st = StreamingRollingFeatures.latestStateBucketed(spark, stateDir)
      .get.collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[Long]("ts_us"))).toSet
    // per-bucket tails retain MORE (user 9's bucket never advanced past
    // 90), and every user keeps a gap anchor
    assert(st.contains((1L, 1000L)) && st.contains((2L, 1010L)) &&
      st.contains((9L, 90L)))
  }
}
