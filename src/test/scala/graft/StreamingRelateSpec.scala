package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Relate, Relation, TimeMachine}
import graft.source.ChangeEvent
import graft.streaming.StreamingUpsert

/** Streaming twins of the two remaining stateful sinks: relate fan-out as
  * a stream-static join inside foreachBatch (SURVEY J1's streaming shape)
  * and the time-machine day-partitioned append sink (K4). */
class StreamingRelateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def mkOps(n: Int): Seq[ChangeEvent] =
    (0 until n).map { i =>
      ChangeEvent(i.toLong, (i % 40).toString, "app", "t0", "app.t0",
        if (i % 3 == 0) "i" else "u",
        1000000L + i, (1000000L + i) * 4, s"""{"k":${i % 40}}""", i.toDouble,
        "oplog")
    }

  test("relate fan-out runs as a stream-static join in foreachBatch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dim = (0 until 40).map(k => (k.toLong, s"dim-$k")).toDF("dim_key", "dim_val")
    val rel = Relation("app.t0", "app.dim", "document.k", "dim_key",
      matchFieldType = Some("long"), broadcastRelated = true)
    val outDir = Files.createTempDirectory("graft-relate-out").toString
    val ckpt = Files.createTempDirectory("graft-relate-ckpt").toString
    val ops = mkOps(200)

    val src = MemoryStream[ChangeEvent]
    src.addData(ops)
    val q = src.toDF().writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Relate.hopPairs(batch, dim, rel)
          .select("event_id", "dim_key", "dim_val")
          .write.mode("append").parquet(outDir)
      }
      .start()
    q.awaitTermination()

    val streamed = spark.read.parquet(outDir)
      .as[(Long, Long, String)].collect().toSet
    val batch = Relate.hopPairs(ops.toDF(), dim, rel)
      .select("event_id", "dim_key", "dim_val")
      .as[(Long, Long, String)].collect().toSet
    assert(streamed == batch && streamed.size == 200)
  }

  test("file-based streaming source: same envelope decode, same final state (S1)") {
    import spark.implicits._
    // stage the events table as a stream-source directory
    val srcDir = Files.createTempDirectory("graft-stream-src").toString
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events.write.mode("overwrite").parquet(srcDir)
    val stateDir = Files.createTempDirectory("graft-fs-state").toString
    val ckpt = Files.createTempDirectory("graft-fs-ckpt").toString

    val stream = spark.readStream.schema(events.schema).parquet(srcDir)
    StreamingUpsert.start(graft.source.EventLog.envelopeFrom(stream),
      stateDir, ckpt).awaitTermination()

    val streamed = StreamingUpsert.liveState(spark, stateDir)
      .select("id", "version").as[(String, Long)].collect().toSet
    val batch = graft.operators.Upsert.liveDocuments(
        graft.source.EventLog.envelope(spark, "/root/testdata/sf0.001"))
      .select("id", "version").as[(String, Long)].collect().toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("time-machine appends day-partitioned history (K4 sink layout)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-history").toString
    val ops = mkOps(100).toDF()
    val h = TimeMachine.history(ops, Seq("app.t0"))
    TimeMachine.writeHistory(h, dir)
    TimeMachine.writeHistory(h, dir) // append-only: a second write adds rows
    val back = spark.read.parquet(dir)
    assert(back.count() == 200)
    // physical layout is day-partitioned (dated-index equivalent)
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("history_date="))
    assert(parts.nonEmpty)
    // partition pruning: a date filter reads only its day
    val day = back.select("history_date").as[String].head()
    val pruned = back.filter(col("history_date") === day)
    assert(pruned.queryExecution.executedPlan.toString.contains("PartitionFilters"))
  }
}
