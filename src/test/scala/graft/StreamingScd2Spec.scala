package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Scd2
import graft.streaming.StreamingScd2

/** The streaming SCD2 twin: closed ∪ open over the stream's lifetime
  * equals the one-shot interval build, kill + resume neither drops nor
  * double-ships, and the bucketed state only rewrites touched buckets. */
class StreamingScd2Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // user 1: A(10) A(20 collapse) B(40) B(50 collapse); user 2: C(45)
  private val batch1 = Seq((1L, 1L, 10L, 5L), (2L, 1L, 20L, 5L))
  private val batch2 = Seq((3L, 1L, 40L, 7L), (4L, 2L, 45L, 1L))
  private val batch3 = Seq((5L, 1L, 50L, 7L))

  private def df(rows: Seq[(Long, Long, Long, Long)]) =
    rows.toDF("event_id", "k", "t", "v")

  private def oneShot =
    Scd2.intervals(df(batch1 ++ batch2 ++ batch3), Seq("k"), col("t"),
        col("v"), "event_id")
      .collect().map(_.toSeq).toSet

  private def openAsIntervals(st: org.apache.spark.sql.DataFrame) =
    st.select(col("k"), col("value"), col("valid_from_us"))
      .withColumn("valid_to_us", lit(null).cast("long"))

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("closed ∪ open over the stream equals the one-shot intervals") {
    implicit val sqlCtx = spark.sqlContext
    val stateDir = tmp("graft-scd2-state")
    val ckpt = tmp("graft-scd2-ckpt")
    val outDir = tmp("graft-scd2-out")
    val src = MemoryStream[(Long, Long, Long, Long)]
    val q = StreamingScd2.start(
      src.toDF().toDF("event_id", "k", "t", "v"), stateDir, ckpt,
      Seq("k"), tsUs = _ => col("t"), valueCol = _ => col("v"),
      onClosed = (c, batchId) => c.write.mode("overwrite")
        .parquet(s"$outDir/b$batchId"),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    Seq(batch1, batch2, batch3).foreach { b =>
      src.addData(b)
      q.processAllAvailable()
    }
    q.stop()
    val closed = spark.read.parquet(s"$outDir/b*")
    val st = StreamingScd2.latestState(spark, stateDir).get
    assert(closed.unionByName(openAsIntervals(st))
      .collect().map(_.toSeq).toSet === oneShot)
    // the boundary-straddling collapse kept the ORIGINAL valid_from and
    // the fence advanced past the collapsed event
    val open = st.collect().map(r => r.getAs[Long]("k") ->
      ((r.getAs[Long]("value"), r.getAs[Long]("valid_from_us"),
        r.getAs[Long]("last_ts_us")))).toMap
    assert(open === Map(1L -> ((7L, 40L, 50L)), 2L -> ((1L, 45L, 45L))))
  }

  test("kill + resume: the replayed batch neither drops nor double-ships") {
    implicit val sqlCtx = spark.sqlContext
    val stateDir = tmp("graft-scd2-state2")
    val ckpt = tmp("graft-scd2-ckpt2")
    val outDir = tmp("graft-scd2-out2")
    def run(data: Seq[Seq[(Long, Long, Long, Long)]]): Unit = {
      val src = MemoryStream[(Long, Long, Long, Long)]
      data.foreach(src.addData(_))
      val q = StreamingScd2.start(
        src.toDF().toDF("event_id", "k", "t", "v"), stateDir, ckpt,
        Seq("k"), tsUs = _ => col("t"), valueCol = _ => col("v"),
        onClosed = (c, batchId) => c.write.mode("overwrite")
          .parquet(s"$outDir/b$batchId"))
      q.processAllAvailable()
      q.stop()
    }
    run(Seq(batch1))
    run(Seq(batch1, batch2, batch3))
    val closed = spark.read.parquet(s"$outDir/b*")
    val st = StreamingScd2.latestState(spark, stateDir).get
    assert(closed.unionByName(openAsIntervals(st))
      .collect().map(_.toSeq).toSet === oneShot)
  }

  test("bucketed state: identity holds, only touched buckets rewrite") {
    val stateDir = tmp("graft-scd2-bkt")
    val closed = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
    def fold(rows: Seq[(Long, Long, Long, Long)], batchId: Long): Unit =
      StreamingScd2.foldBatchBucketed(df(rows), batchId, stateDir,
        keyCol = "k", tsUs = _ => col("t"), valueCol = _ => col("v"),
        numBuckets = 8,
        onClosed = (c, _) => closed ++= c.collect().map(_.toSeq))
    fold(batch1, 0L)
    // a batch touching ONLY key 9 commits exactly one bucket version
    fold(Seq((9L, 9L, 5L, 3L)), 1L)
    val bucketDirs = new java.io.File(stateDir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("b"))
    assert(bucketDirs.count(d => new java.io.File(d, "v1").exists()) === 1)
    fold(batch2, 2L)
    fold(batch2, 2L) // crash replay: recomputes, never regresses
    fold(batch3, 3L)
    val st = StreamingScd2.latestStateBucketed(spark, stateDir).get
    val expect = Scd2.intervals(
      df(batch1 ++ batch2 ++ batch3)
        .unionByName(df(Seq((9L, 9L, 5L, 3L)))),
      Seq("k"), col("t"), col("v"), "event_id")
      .collect().map(_.toSeq).toSet
    val dedup = closed.groupBy(r => (r(0), r(2))).map(_._2.head).toSet
    assert((dedup ++ openAsIntervals(st).collect().map(_.toSeq).toSet)
      === expect)
  }
}
