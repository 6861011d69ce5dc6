package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sessionize
import graft.streaming.StreamingSessionize

/** The streaming sessionization twin: closed ∪ state over the stream's
  * lifetime equals the one-shot session table, kill + resume neither
  * drops nor double-counts, and closed sessions ship before the state
  * commits. */
class StreamingSessionizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // user 1: sessions [0,10], [5000..5500], [9000]; user 2: [100], [7000]
  private val batch1 = Seq((1L, 1L, 0L), (2L, 1L, 10L), (3L, 2L, 100L),
    (4L, 1L, 5000L))
  private val batch2 = Seq((5L, 1L, 5500L), (6L, 2L, 7000L),
    (7L, 1L, 9000L))

  private def allEvents = (batch1 ++ batch2).toDF("event_id", "user_id", "t")

  private def oneShot =
    Sessionize.sessionStats(allEvents, gapUs = 1000L, tsUs = col("t"))
      .collect().map(_.toSeq).toSet

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("closed ∪ state over the stream equals the one-shot sessions") {
    implicit val sqlCtx = spark.sqlContext
    val stateDir = tmp("graft-sess-state")
    val ckpt = tmp("graft-sess-ckpt")
    val closedDir = tmp("graft-sess-closed")
    val src = MemoryStream[(Long, Long, Long)]
    val q = StreamingSessionize.start(
      src.toDF().toDF("event_id", "user_id", "t"), stateDir, ckpt,
      gapUs = 1000L, tsUs = _ => col("t"),
      onClosed = (closed, batchId) => closed.write.mode("overwrite")
        .parquet(s"$closedDir/b$batchId"),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    src.addData(batch1)
    q.processAllAvailable()
    src.addData(batch2)
    q.processAllAvailable()
    q.stop()
    val closed = spark.read.parquet(s"$closedDir/b*")
    val state = StreamingSessionize.latestState(spark, stateDir).get
    assert(closed.unionByName(state).collect().map(_.toSeq).toSet
      === oneShot)
  }

  test("bucketed state: equal to one-shot, only touched buckets rewrite") {
    val stateDir = tmp("graft-sess-bkt")
    val closed = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
    def fold(rows: Seq[(Long, Long, Long)], batchId: Long): Unit =
      StreamingSessionize.foldBatchBucketed(
        rows.toDF("event_id", "user_id", "t"), batchId, stateDir,
        gapUs = 1000L, tsUs = _ => col("t"), numBuckets = 8,
        onClosed = (c, _) => closed ++= c.collect().map(_.toSeq))
    fold(batch1, 0L)
    // user 3 only: exactly one bucket may rewrite in batch 1
    fold(Seq((8L, 3L, 0L)), 1L)
    val bucketDirs = new java.io.File(stateDir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("b"))
    val withV1 = bucketDirs.filter(d =>
      new java.io.File(d, "v1").exists())
    assert(withV1.length === 1) // only user 3's bucket committed v1
    fold(batch2, 2L)
    // replay of batch 2 (crash recovery) must not change the outcome
    fold(batch2, 2L)
    val state = StreamingSessionize.latestStateBucketed(spark, stateDir).get
    val expect = Sessionize.sessionStats(
      allEvents.unionByName(Seq((8L, 3L, 0L)).toDF("event_id", "user_id", "t")),
      gapUs = 1000L, tsUs = col("t")).collect().map(_.toSeq).toSet
    assert((closed.toSet ++ state.collect().map(_.toSeq).toSet) === expect)
  }

  test("kill + resume: the replayed batch neither drops nor double-counts") {
    implicit val sqlCtx = spark.sqlContext
    val stateDir = tmp("graft-sess-state2")
    val ckpt = tmp("graft-sess-ckpt2")
    val closedDir = tmp("graft-sess-closed2")
    def run(data: Seq[Seq[(Long, Long, Long)]]): Unit = {
      val src = MemoryStream[(Long, Long, Long)]
      data.foreach(src.addData(_))
      val q = StreamingSessionize.start(
        src.toDF().toDF("event_id", "user_id", "t"), stateDir, ckpt,
        gapUs = 1000L, tsUs = _ => col("t"),
        onClosed = (closed, batchId) => closed.write.mode("overwrite")
          .parquet(s"$closedDir/b$batchId"))
      q.processAllAvailable()
      q.stop()
    }
    run(Seq(batch1))
    // the restarted source re-serves the committed prefix: offsets skip
    // it, and the versioned state keeps batch 0's fold
    run(Seq(batch1, batch2))
    val closed = spark.read.parquet(s"$closedDir/b*")
    val state = StreamingSessionize.latestState(spark, stateDir).get
    assert(closed.unionByName(state).collect().map(_.toSeq).toSet
      === oneShot)
  }
}
