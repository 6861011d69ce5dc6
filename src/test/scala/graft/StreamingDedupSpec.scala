package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming twin of exact dedup (q30): `dropDuplicates` on the content
  * hash keeps first-seen documents across micro-batches in the engine's
  * state store — the continuous form of the one-shuffle batch dedup. At
  * scale the same query takes `withWatermark` to bound state by event
  * time. */
class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("cross-batch duplicates are dropped via keyed state") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val src = MemoryStream[(Long, String)]
    val deduped = src.toDF().toDF("doc_id", "text")
      .withColumn("text_hash", md5(col("text")))
      .dropDuplicates("text_hash")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    // batch 1: two docs, one internal dup
    src.addData((1L, "alpha"), (2L, "beta"), (3L, "alpha"))
    q.processAllAvailable()
    // batch 2: a cross-batch dup of "beta" and one new doc
    src.addData((4L, "beta"), (5L, "gamma"))
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("dedup_out").select("text")
      .as[String].collect().sorted.toSeq
    assert(kept == Seq("alpha", "beta", "gamma"))
  }
}
