package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{Pii, Sampling, Sharding, TextAnalysis}

/** The narrow curation operators (quality, repetition, PII, split) are
  * pure per-row column algebra, so they run UNCHANGED inside Structured
  * Streaming — no twin implementation, no keyed state, no watermark.
  * This spec pins that property: the same operator chain over the same
  * rows produces identical results batch and streamed, across multiple
  * micro-batches. (The stateful members of the family — dedup, packing,
  * the patch log — have dedicated keyed-state twins and specs.) */
class StreamingCurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def signals(df: org.apache.spark.sql.DataFrame) =
    Sharding.withShard(
      Sampling.withSplit(
        Pii.withPiiRedaction(
          TextAnalysis.withRepetition(
            TextAnalysis.withQuality(df)))), nShards = 4)
      .select("doc_id", "n_words", "quality_bucket", "adj_dups",
        "repetitive", "n_emails", "redacted", "split", "shard")

  test("the narrow operator chain is batch/stream identical") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val rows = Seq(
      (1L, "the quick fox and the lazy dog and the quick fox again more words to pass the length gate of twenty words total here now"),
      (2L, "short doc"),
      (3L, "ping me at a.b@example.org or 555-123-4567 " + Seq.fill(20)("w").mkString(" ")),
      (4L, "w w w w w w w w w w w w w w w w w w w w w w"))
    val src = MemoryStream[(Long, String)]
    val q = signals(src.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("curation_out")
      .outputMode("append").start()
    src.addData(rows.take(2))
    q.processAllAvailable()
    src.addData(rows.drop(2))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("curation_out").collect()
      .map(_.toSeq).toSet
    val batch = signals(rows.toDF("doc_id", "text")).collect()
      .map(_.toSeq).toSet
    assert(streamed == batch && batch.size == 4)
  }
}
