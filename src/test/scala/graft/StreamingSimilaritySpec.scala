package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Similarity

/** The IVF assignment is purely map-side (broadcast centroids, no
  * shuffle), so the exact same operator must run unchanged on a stream —
  * the shape of continuously bucketing fresh embeddings as they arrive
  * (the ingest half of a continuously-maintained ANN index). Batch and
  * stream must agree bucket-for-bucket. */
class StreamingSimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streamed IVF bucket assignment equals the batch assignment") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = Similarity.collectCentroids(
      e.filter(col("vec_id") % 50 === 0))
    val batch = Similarity.ivfAssign(e, cents, "vec_id", "embedding")
      .select(col("vec_id").cast("long"), col("bucket"))
      .as[(Long, Long)].collect().toSet

    val rows = e.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])].collect().toSeq
    val (b1, b2) = rows.splitAt(rows.length / 2)
    val src = MemoryStream[(Long, Array[Float])]
    src.addData(b1)
    src.addData(b2)
    val q = Similarity.ivfAssign(
        src.toDF().toDF("vec_id", "embedding"), cents, "vec_id", "embedding")
      .select(col("vec_id"), col("bucket"))
      .writeStream.format("memory").queryName("ivf_stream")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("ivf_stream")
      .as[(Long, Long)].collect().toSet
    assert(streamed == batch && streamed.nonEmpty)
  }
}
