package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.codec.JsonMergePatch
import graft.operators.PatchLog
import graft.source.ChangeEvent
import graft.streaming.StreamingPatchLog

/** P10 streaming parity: the keyed-state patch log must produce exactly
  * the batch `lag()`-pair patches over the same ops — including across a
  * kill + resume, where the previous doc per key must survive in
  * checkpointed state rather than in any window. */
class StreamingPatchLogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Ops over 7 keys whose docs change shape run to run: field `b`
    * appears and disappears (exercising RFC-7386 null-removals), the
    * nested `n.c` value moves (exercising recursive diffs), every 13th
    * op carries NO document (a data-less update notification), and every
    * 17th op is a DELETE (the chain fence: the next insert must restart
    * at v1 = the full doc) — both logs must treat all of these
    * identically or the parity check fails. */
  private def mkOps(n: Int): Seq[ChangeEvent] =
    (0 until n).map { i =>
      val id = (i % 7).toString
      val op =
        if (i % 17 == 5) "d" else if (i % 3 == 0) "i" else "u"
      val doc =
        if (op == "d") null
        else if (i % 13 == 0 && i % 3 != 0) null
        else if (i % 5 == 0) s"""{"a":$i,"n":{"c":${i % 3}}}"""
        else s"""{"a":$i,"b":"x$i","n":{"c":${i % 3}}}"""
      ChangeEvent(i.toLong, id, "app", "t0", "app.t0", op,
        1000000L + i, (1000000L + i) * 4, doc, i.toDouble, "oplog")
    }

  private def expectedBatch(ops: Seq[ChangeEvent]): Set[(String, Int, String)] = {
    import spark.implicits._
    val diffUdf = udf((prev: String, curr: String) =>
      if (prev == null) JsonMergePatch.canonicalJson(curr)
      else JsonMergePatch.diff(prev, curr))
    PatchLog.pairs(ops.toDF(), Seq("app.t0"))
      .withColumn("patch", diffUdf(col("prev_document"), col("document")))
      .select(col("id"), col("v"), col("patch"))
      .as[(String, Int, String)].collect().toSet
  }

  private def runToFiles(blocks: Seq[Seq[ChangeEvent]], outDir: String,
                         ckptDir: String): Unit = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val src = MemoryStream[ChangeEvent]
    blocks.foreach(src.addData(_))
    val q = StreamingPatchLog.patches(src.toDS(), Seq("app.t0"))
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckptDir)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("kill + resume: streamed patches equal the batch merge-patch log") {
    import spark.implicits._
    val ops = mkOps(140)
    val (h1, h2) = ops.splitAt(70)
    val outDir = Files.createTempDirectory("graft-patch-out").toString
    val ckptDir = Files.createTempDirectory("graft-patch-ckpt").toString

    // run 1: first half, then the query stops (the "crash")
    runToFiles(Seq(h1), outDir, ckptDir)
    // run 2: NEW query, same checkpoint — the replayed source prefix is
    // skipped by offset and per-key state (v counter + last doc) carries
    // over, so patches continue rather than restart
    runToFiles(Seq(h1, h2), outDir, ckptDir)

    val streamed = spark.read.parquet(outDir)
      .select("id", "v", "patch")
      .as[(String, Int, String)].collect().toSet
    val expected = expectedBatch(ops)
    assert(streamed == expected)
    assert(streamed.nonEmpty)
    // the resume produced continuations, not restarts: some key's patch
    // count exceeds anything a single half could produce alone
    assert(streamed.map(_._2).max > 10)
  }

  test("same id across namespaces yields separate, labeled chains") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ops = Seq(
      ChangeEvent(1L, "k", "app", "t0", "app.t0", "i", 10L, 40L,
        """{"a":1}""", 0.0, "oplog"),
      ChangeEvent(2L, "k", "app", "t1", "app.t1", "i", 10L, 41L,
        """{"b":2}""", 0.0, "oplog"),
      ChangeEvent(3L, "k", "app", "t0", "app.t0", "u", 11L, 45L,
        """{"a":9}""", 0.0, "oplog"))
    val src = MemoryStream[ChangeEvent]
    src.addData(ops)
    val q = StreamingPatchLog.patches(src.toDS(), Seq("app.t0", "app.t1"))
      .writeStream.format("memory").queryName("patch_ns")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("patch_ns")
      .select("namespace", "id", "v", "patch")
      .as[(String, String, Int, String)].collect().toSet
    // app.t0's id "k" chains v1→v2; app.t1's id "k" is an independent v1
    assert(rows == Set(
      ("app.t0", "k", 1, """{"a":1}"""),
      ("app.t0", "k", 2, """{"a":9}"""),
      ("app.t1", "k", 1, """{"b":2}""")))
  }

  test("v1 is the canonical full doc; later patches diff prev → curr") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ops = Seq(
      ChangeEvent(1L, "k", "app", "t0", "app.t0", "i", 10L, 40L,
        """{"b":"x","a":1}""", 0.0, "oplog"),
      ChangeEvent(2L, "k", "app", "t0", "app.t0", "u", 11L, 45L,
        """{"a":2,"n":{"c":1}}""", 0.0, "oplog"))
    val src = MemoryStream[ChangeEvent]
    src.addData(ops)
    val q = StreamingPatchLog.patches(src.toDS(), Seq("app.t0"))
      .writeStream.format("memory").queryName("patch_two")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("patch_two").select("v", "patch")
      .as[(Int, String)].collect().sortBy(_._1).toSeq
    // v1: full doc, keys sorted; v2: b removed (null), a changed, n added
    assert(rows == Seq(
      1 -> """{"a":1,"b":"x"}""",
      2 -> """{"a":2,"b":null,"n":{"c":1}}"""))
  }
}
