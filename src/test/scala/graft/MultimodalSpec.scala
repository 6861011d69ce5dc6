package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal._

/** Multimodal plumbing: typed asset schema, batched per-partition feature
  * extraction (the mapInPandas-shaped loop), deterministic stub decode,
  * resize/frame-sample contracts. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def assets = Multimodal.assetsFromDocuments(
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text"))

  test("asset schema: opaque binary content + typed metadata struct") {
    val schema = assets.schema
    assert(schema("content").dataType.typeName == "binary")
    val meta = schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSeq ==
      Seq("width", "height", "sample_rate", "duration_ms", "format"))
  }

  test("batched feature extraction is deterministic and length-stable") {
    import spark.implicits._
    val ds = assets.as[MediaAsset].repartition(3, col("kind"))
    val feats = Multimodal.extractFeatures(ds).collect()
    assert(feats.length == assets.count())
    assert(feats.forall(_.feature.length == Multimodal.FeatureDim))
    // deterministic: same input → same histogram, sums to ~1
    val f = feats.minBy(_.asset_id)
    val again = Multimodal.decodeStub(
      assets.orderBy("asset_id").select("content").as[Array[Byte]].head())
    assert(f.feature.toSeq == again.toSeq)
    assert(math.abs(f.feature.sum - 1f) < 1e-3)
  }

  test("feature extraction over REAL binary files via the binaryFile source") {
    import spark.implicits._
    // genuine non-UTF-8 bytes on disk, read through the production
    // source — not text cast to binary
    val fixDir = graft.source.BinaryFixtures.ensure(spark, "/root/testdata/sf0.001")
    val real = spark.read.format("binaryFile").load(s"$fixDir/*.bin")
      .select(
        regexp_extract(col("path"), "doc_(\\d+)\\.bin$", 1)
          .cast("long").as("asset_id"),
        lit("image").as("kind"), col("content"),
        struct(lit(0).as("width"), lit(0).as("height"),
          lit(0).as("sample_rate"), lit(0L).as("duration_ms"),
          lit("bin").as("format")).as("meta"))
      .as[MediaAsset]
    val feats = Multimodal.extractFeatures(real).collect()
    assert(feats.nonEmpty)
    // lengths follow the generator's 16·((id div 10)%4+1) rule (all four
    // 16/32/48/64 variants present) and features reproduce the stub
    // decode of the same on-disk bytes
    assert(feats.forall(f => f.n_bytes == 16 * (f.asset_id / 10 % 4 + 1)))
    assert(feats.map(_.n_bytes).distinct.sorted.toSeq == Seq(16, 32, 48, 64))
    val byId = real.collect().map(a => a.asset_id -> a.content).toMap
    assert(feats.forall(f =>
      f.feature.toSeq == Multimodal.decodeStub(byId(f.asset_id)).toSeq))
  }

  test("resize pads/crops to the requested dim; frame sampling strides") {
    assert(Multimodal.resizeStub(Array(1f, 2f, 3f), 2).toSeq == Seq(1f, 2f))
    assert(Multimodal.resizeStub(Array(1f), 3).toSeq == Seq(1f, 0f, 0f))
    val frames = Multimodal.sampleFrames(Array.tabulate(100)(_.toByte), 10, 3)
    assert(frames.map(_._1) == Seq(0, 3, 6, 9))
    assert(frames.head._2.length == 10)
  }
}
