package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsofJoin
import graft.streaming.StreamingAsof

/** The streaming as-of twin: matched rows over the stream's lifetime
  * equal the one-shot join, kill + resume neither drops nor
  * double-matches, and the bucketed state only rewrites touched
  * buckets. */
class StreamingAsofSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // (event_id, user_id, typ, t): p = left (probe), v = right (state)
  private val batch1 = Seq((1L, 1L, "v", 5L), (2L, 1L, "p", 10L),
    (3L, 2L, "p", 10L))
  private val batch2 = Seq((4L, 1L, "p", 20L), (5L, 1L, "v", 25L),
    (6L, 1L, "p", 30L), (7L, 2L, "v", 30L))
  private val batch3 = Seq((8L, 2L, "p", 40L))

  private def df(rows: Seq[(Long, Long, String, Long)]) =
    rows.toDF("event_id", "user_id", "typ", "t")

  private def lefts(b: org.apache.spark.sql.DataFrame) =
    b.filter(col("typ") === "p").select("event_id", "user_id", "t")
  private def rights(b: org.apache.spark.sql.DataFrame) =
    b.filter(col("typ") === "v")
      .select(col("user_id"), col("event_id").as("rid"), col("t"))

  private def oneShot = {
    val all = df(batch1 ++ batch2 ++ batch3)
    AsofJoin.asofBackward(lefts(all), rights(all), Seq("user_id"),
        col("t"), col("t"), "rid")
      .select("event_id", "asof_rid", "asof_ts_us")
      .collect().map(_.toSeq).toSet
  }

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("matched rows over the stream equal the one-shot as-of") {
    implicit val sqlCtx = spark.sqlContext
    val stateDir = tmp("graft-asof-state")
    val ckpt = tmp("graft-asof-ckpt")
    val outDir = tmp("graft-asof-out")
    val src = MemoryStream[(Long, Long, String, Long)]
    val q = StreamingAsof.start(
      src.toDF().toDF("event_id", "user_id", "typ", "t"), stateDir, ckpt,
      Seq("user_id"), lefts, rights, "t", "t", "rid",
      onMatched = (m, batchId) => m.write.mode("overwrite")
        .parquet(s"$outDir/b$batchId"),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    Seq(batch1, batch2, batch3).foreach { b =>
      src.addData(b)
      q.processAllAvailable()
    }
    q.stop()
    val matched = spark.read.parquet(s"$outDir/b*")
      .select("event_id", "asof_rid", "asof_ts_us")
    assert(matched.collect().map(_.toSeq).toSet === oneShot)
    // the state is the latest right per key
    val st = StreamingAsof.latestState(spark, stateDir).get
      .collect().map(r => r.getAs[Long]("user_id") ->
        r.getAs[Long]("rid")).toMap
    assert(st === Map(1L -> 5L, 2L -> 7L))
  }

  test("kill + resume: the replayed batch neither drops nor double-matches") {
    implicit val sqlCtx = spark.sqlContext
    val stateDir = tmp("graft-asof-state2")
    val ckpt = tmp("graft-asof-ckpt2")
    val outDir = tmp("graft-asof-out2")
    def run(data: Seq[Seq[(Long, Long, String, Long)]]): Unit = {
      val src = MemoryStream[(Long, Long, String, Long)]
      data.foreach(src.addData(_))
      val q = StreamingAsof.start(
        src.toDF().toDF("event_id", "user_id", "typ", "t"), stateDir, ckpt,
        Seq("user_id"), lefts, rights, "t", "t", "rid",
        onMatched = (m, batchId) => m.write.mode("overwrite")
          .parquet(s"$outDir/b$batchId"))
      q.processAllAvailable()
      q.stop()
    }
    run(Seq(batch1))
    run(Seq(batch1, batch2, batch3))
    val matched = spark.read.parquet(s"$outDir/b*")
      .select("event_id", "asof_rid", "asof_ts_us")
    assert(matched.collect().map(_.toSeq).toSet === oneShot)
  }

  test("bucketed state: identity holds, only touched buckets rewrite") {
    val stateDir = tmp("graft-asof-bkt")
    val matched = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
    def fold(rows: Seq[(Long, Long, String, Long)], batchId: Long): Unit =
      StreamingAsof.foldBatchBucketed(df(rows), batchId, stateDir,
        keyCol = "user_id", lefts, rights, "t", "t", "rid", numBuckets = 8,
        onMatched = (m, _) => matched ++= m
          .select("event_id", "asof_rid", "asof_ts_us")
          .collect().map(_.toSeq))
    fold(batch1, 0L)
    // a batch touching ONLY user 3 commits exactly one bucket version
    fold(Seq((9L, 3L, "v", 1L)), 1L)
    val bucketDirs = new java.io.File(stateDir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("b"))
    assert(bucketDirs.count(d => new java.io.File(d, "v1").exists()) === 1)
    fold(batch2, 2L)
    fold(batch2, 2L) // crash replay: recomputes, never regresses
    fold(batch3, 3L)
    assert(matched.toSet.filterNot(_.head == 9L).size >= oneShot.size)
    // de-duplicated by event (replay is at-least-once), equals one-shot
    val dedup = matched.groupBy(_.head).map(_._2.head).toSet
    assert(dedup === oneShot)
    val st = StreamingAsof.latestStateBucketed(spark, stateDir).get
      .collect().map(r => r.getAs[Long]("user_id") ->
        r.getAs[Long]("rid")).toMap
    assert(st === Map(1L -> 5L, 2L -> 7L, 3L -> 9L))
  }
}
