package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Packing
import graft.streaming.StreamingPacking

/** Streaming packing parity: keyed per-bucket state must continue
  * half-full packs across micro-batches AND across a kill + resume, so
  * the streamed assignment equals the batch window's over the same
  * id-ordered corpus. */
class StreamingPackingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val Budget = 64
  private val Buckets = 4

  // doc i: (i % 40) + 1 whitespace tokens — same corpus as PackingSpec
  private def mkDocs(from: Int, until: Int): Seq[(Long, String)] =
    (from until until).map(i => (i.toLong, Seq.fill(i % 40 + 1)("w").mkString(" ")))

  private def runToFiles(blocks: Seq[Seq[(Long, String)]], outDir: String,
                         ckptDir: String): Unit = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val src = MemoryStream[(Long, String)]
    blocks.foreach(src.addData(_))
    val q = StreamingPacking.packs(src.toDS(), Budget, Buckets)
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckptDir)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("kill + resume: streamed packs equal the batch window's packs") {
    import spark.implicits._
    val docs = mkDocs(0, 300)
    val (h1, h2) = docs.splitAt(150)
    val outDir = Files.createTempDirectory("graft-pack-out").toString
    val ckptDir = Files.createTempDirectory("graft-pack-ckpt").toString

    // run 1: first half, then the query stops (the "crash")
    runToFiles(Seq(h1), outDir, ckptDir)
    // run 2: NEW query, same checkpoint — replayed prefix skipped by
    // offset, per-bucket running totals carry over, so half-full packs
    // keep filling instead of restarting at pack 0
    runToFiles(Seq(h1, h2), outDir, ckptDir)

    val streamed = spark.read.parquet(outDir)
      .select("doc_id", "tokens", "bucket", "pack_id")
      .as[(Long, Int, Long, Long)].collect().toSet

    val batch = Packing.withPacks(
        docs.toDF("doc_id", "text"), Budget, Buckets)
      .select(col("doc_id"), col("tokens"), col("bucket"), col("pack_id"))
      .as[(Long, Int, Long, Long)].collect().toSet

    assert(streamed == batch)
  }
}
