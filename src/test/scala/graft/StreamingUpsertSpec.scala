package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{NamespaceFilter, NamespaceFilterConfig, Routing, TransformRegistry, Upsert}
import graft.source.ChangeEvent
import graft.streaming.StreamingUpsert

/** Streaming parity (T1-T4): a change stream killed and resumed
  * mid-flight must converge to the exact state the batch path computes
  * over the same ops — the reference's checkpoint/resume heart
  * (monstache.go:5019-5101, 1689-1702, 4664-4716). */
class StreamingUpsertSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def mkOps(n: Int): Seq[ChangeEvent] =
    (0 until n).map { i =>
      val id = (i % 17).toString
      val op = if (i % 11 == 0) "d" else if (i % 3 == 0) "i" else "u"
      ChangeEvent(i.toLong, id, "app", "t0", "app.t0", op,
        1000000L + i, (1000000L + i) * 4, s"""{"k":$i}""", i.toDouble, "oplog")
    }

  test("a torn (uncommitted) state version is invisible to readers") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-torn-state").toString
    StreamingUpsert.mergeBatch(mkOps(60).toDF(), 5L, dir)
    val committed = StreamingUpsert.liveState(spark, dir)
      .select("id", "version").as[(String, Long)].collect().toSet
    // simulate a crash mid-write of batch 6: a v6 directory exists but
    // carries no _SUCCESS job-commit marker
    val torn = java.nio.file.Paths.get(dir, "v6")
    java.nio.file.Files.createDirectories(torn)
    java.nio.file.Files.write(torn.resolve("part-garbage"), Array[Byte](1, 2))
    val seen = StreamingUpsert.liveState(spark, dir)
      .select("id", "version").as[(String, Long)].collect().toSet
    assert(seen == committed && seen.nonEmpty,
      "reader must select the intact predecessor, not the torn version")
  }

  test("merging into a further-progressed state dir is a loud error") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-future-state").toString
    StreamingUpsert.mergeBatch(mkOps(60).toDF(), 5L, dir)
    // a FRESH checkpoint reusing this state dir would merge batch 0
    // blindly and invisibly under the committed v5 — silent resurrection
    val e = intercept[IllegalArgumentException](
      StreamingUpsert.mergeBatch(mkOps(10).toDF(), 0L, dir))
    assert(e.getMessage.contains("further-progressed"))
  }

  test("liveState before any commit is empty WITH the envelope schema") {
    val dir = Files.createTempDirectory("graft-nostate").toString
    val live = StreamingUpsert.liveState(spark, s"$dir/never-written")
    // the documented call shape must not crash on the empty case
    assert(live.select("id", "version", "operation").count() == 0)
  }

  test("kill + resume from checkpoint converges to the batch LWW state") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ops = mkOps(400)
    val (firstHalf, secondHalf) = ops.splitAt(200)
    val stateDir = Files.createTempDirectory("graft-state").toString
    val ckptDir = Files.createTempDirectory("graft-ckpt").toString

    // run 1: first half, then the query is stopped (the "crash")
    val s1 = MemoryStream[ChangeEvent]
    s1.addData(firstHalf)
    val q1 = StreamingUpsert.start(s1.toDF(), stateDir, ckptDir)
    q1.awaitTermination()

    // run 2: a NEW query on the same checkpoint picks up and processes
    // only the remainder
    val s2 = MemoryStream[ChangeEvent]
    s2.addData(firstHalf) // replayed source content; checkpoint must skip it
    s2.addData(secondHalf)
    val q2 = StreamingUpsert.start(s2.toDF(), stateDir, ckptDir)
    q2.awaitTermination()

    val streamed = StreamingUpsert.liveState(spark, stateDir)
      .select("id", "operation", "version")
      .as[(String, String, Long)].collect().toSet
    val batch = Upsert.liveDocuments(ops.toDF())
      .select("id", "operation", "version")
      .as[(String, String, Long)].collect().toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("replayed micro-batch merge is idempotent (at-least-once safe)") {
    import spark.implicits._
    val stateDir = Files.createTempDirectory("graft-state2").toString
    val ops = mkOps(100)
    val (b0, b1) = ops.splitAt(50)
    StreamingUpsert.mergeBatch(b0.toDF(), 0L, stateDir)
    StreamingUpsert.mergeBatch(b1.toDF(), 1L, stateDir)
    val once = StreamingUpsert.liveState(spark, stateDir)
      .select("id", "version").as[(String, Long)].collect().toSet
    // crash-replay of batch 1: same input, same batch id
    StreamingUpsert.mergeBatch(b1.toDF(), 1L, stateDir)
    val twice = StreamingUpsert.liveState(spark, stateDir)
      .select("id", "version").as[(String, Long)].collect().toSet
    assert(once == twice)
  }

  test("the full hot path is batch/stream equivalent under checkpointing") {
    // SURVEY §3.1 as one transform: ns filter → registry (filter + mapper
    // + finalize) → routing meta → LWW state; run it both as a batch pass
    // and under foreachBatch with a mid-stream restart — same final docs.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.DataFrame
    val ops = mkOps(400)
    val hotPath: DataFrame => DataFrame = { df =>
      val reg = TransformRegistry(
        filters = Map("" -> (col("value") < 380)),
        mappers = Map("app.t0" -> (d => d.withColumn("m_meta_index", lit("hot_t0")))))
      Routing.withMeta(reg(NamespaceFilter(df,
        NamespaceFilterConfig(include = Some("^app\\..*$")))))
    }
    val batchFinal = Upsert.liveDocuments(hotPath(ops.toDF()))
      .select("id", "version", "meta_index")
      .as[(String, Long, String)].collect().toSet

    val stateDir = Files.createTempDirectory("graft-hot-state").toString
    val ckptDir = Files.createTempDirectory("graft-hot-ckpt").toString
    val (h1, h2) = ops.splitAt(200)
    val s1 = MemoryStream[ChangeEvent]
    s1.addData(h1)
    StreamingUpsert.start(s1.toDF(), stateDir, ckptDir, transform = hotPath)
      .awaitTermination()
    val s2 = MemoryStream[ChangeEvent]
    s2.addData(h1); s2.addData(h2) // replayed prefix; checkpoint skips it
    StreamingUpsert.start(s2.toDF(), stateDir, ckptDir, transform = hotPath)
      .awaitTermination()
    val streamFinal = StreamingUpsert.liveState(spark, stateDir)
      .select("id", "version", "meta_index")
      .as[(String, Long, String)].collect().toSet
    assert(streamFinal == batchFinal && streamFinal.nonEmpty)
    // the per-doc meta override survived the streaming path
    assert(streamFinal.exists(_._3 == "hot_t0"))
  }

  test("post-process hook (K6) sees every batch after its merge") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ops = mkOps(120)
    val stateDir = Files.createTempDirectory("graft-state3").toString
    val ckptDir = Files.createTempDirectory("graft-ckpt3").toString
    val seen = scala.collection.mutable.ArrayBuffer[(Long, Long, Boolean)]()
    val src = MemoryStream[ChangeEvent]
    src.addData(ops)
    val q = StreamingUpsert.start(src.toDF(), stateDir, ckptDir,
      postProcess = (batch, id) => seen.synchronized {
        // the hook runs after the merge (runProcessor is downstream of
        // doIndex, monstache.go:3306-3326): state must already hold it
        val merged = StreamingUpsert.latestState(spark, stateDir).isDefined
        seen += ((id, batch.count(), merged))
      })
    q.awaitTermination()
    val rows = seen.synchronized(seen.toList)
    assert(rows.map(_._2).sum == 120) // every op handed to the hook once
    assert(rows.forall(_._3), "hook ran before the state merge")
  }

  test("keyed-state winners stream equals batch winners (T6)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ops = mkOps(300)
    val src = MemoryStream[ChangeEvent]
    src.addData(ops)
    val q = StreamingUpsert.latestWinners(src.toDS())
      .writeStream.format("memory").queryName("winners")
      .outputMode("update").start()
    q.processAllAvailable()
    q.stop()
    // last update per key in the memory sink is that key's final winner
    val streamed = spark.table("winners")
      .groupBy("id").agg(max(struct(col("version"), col("event_id"))).as("w"))
      .select(col("id"), col("w.version"))
      .as[(String, Long)].collect().toSet
    val batch = Upsert.lastWriterWins(ops.toDF())
      .select("id", "version").as[(String, Long)].collect().toSet
    assert(streamed == batch)
  }

  test("keyed state survives kill+resume on the RocksDB store (the 100 TB path)") {
    // StreamingUpsert's docs claim the scale path for state beyond a few
    // GB is latestWinners over the RocksDB state store — prove the claim:
    // same operator, RocksDB provider, state carried across a query
    // restart through the checkpoint (not through memory)
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // run 1 carries every key's TRUE winner (high versions); run 2
      // re-delivers only LATE, lower-version ops for the same keys — the
      // keys are touched (so update mode re-emits them) but their winners
      // exist solely in run 1's persisted state
      def ev(eid: Long, id: String, ver: Long) =
        ChangeEvent(eid, id, "app", "t0", "app.t0", "u",
          1000000L + eid, ver, s"""{"k":$eid}""", 0.0, "oplog")
      val h1 = (0 until 100).map(i => ev(i, "k" + (i % 7), 1000L + i))
      val h2 = (0 until 30).map(i => ev(200L + i, "k" + (i % 7), 10L + i))
      val ops = h1 ++ h2
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-rocksdb-ckpt").toString
      val outDir = java.nio.file.Files
        .createTempDirectory("graft-rocksdb-out").toString
      val src = MemoryStream[ChangeEvent]
      def run(): Unit = {
        // memory sinks cannot recover from a checkpoint; foreachBatch can
        val q = StreamingUpsert.latestWinners(src.toDS())
          .writeStream
          .option("checkpointLocation", ckpt)
          .outputMode("update")
          .foreachBatch { (b: org.apache.spark.sql.Dataset[ChangeEvent], _: Long) =>
            b.write.mode("append").parquet(outDir)
          }
          .start()
        q.processAllAvailable()
        q.stop()
      }
      src.addData(h1)
      run() // run 1, then the "crash"
      src.addData(h2)
      run() // resume: h1's winners must come from RocksDB state
      // winners are monotonic per key, so the max emission is the final one
      val streamed = spark.read.parquet(outDir)
        .groupBy("id").agg(max(struct(col("version"), col("event_id"))).as("w"))
        .select(col("id"), col("w.version"))
        .as[(String, Long)].collect().toSet
      val batch = Upsert.lastWriterWins(ops.toDF())
        .select("id", "version").as[(String, Long)].collect().toSet
      // h2 alone cannot reproduce keys whose winner lives in h1 — equality
      // requires the resumed query to have read run 1's RocksDB state
      val h2Winners = Upsert.lastWriterWins(h2.toDF())
        .select("id", "version").as[(String, Long)].collect().toSet
      assert(streamed == batch && h2Winners != batch)
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
