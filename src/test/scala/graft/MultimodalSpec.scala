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

  test("resize pads/crops to the requested dim; frame sampling strides") {
    assert(Multimodal.resizeStub(Array(1f, 2f, 3f), 2).toSeq == Seq(1f, 2f))
    assert(Multimodal.resizeStub(Array(1f), 3).toSeq == Seq(1f, 0f, 0f))
    val frames = Multimodal.sampleFrames(Array.tabulate(100)(_.toByte), 10, 3)
    assert(frames.map(_._1) == Seq(0, 3, 6, 9))
    assert(frames.head._2.length == 10)
  }
}
