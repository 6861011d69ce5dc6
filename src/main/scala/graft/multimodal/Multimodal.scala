package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Typed media asset: opaque bytes + typed metadata. The schema contract
  * for multimodal training-data pipelines — content is never interpreted
  * by Spark itself (parquet BINARY / `binaryFile` source at scale), all
  * shaping happens on the metadata struct, and decode/feature steps run
  * per-partition in fixed-size batches. */
case class MediaMeta(
    width: Int,          // images/video
    height: Int,
    sample_rate: Int,    // audio
    duration_ms: Long,
    format: String)

case class MediaAsset(
    asset_id: Long,
    kind: String, // image | audio | video
    content: Array[Byte],
    meta: MediaMeta)

case class MediaFeature(
    asset_id: Long,
    kind: String,
    n_bytes: Long,
    feature: Array[Float])

/** Multimodal column operators. The decode step is a clearly-marked
  * DETERMINISTIC STUB (this container has no image/audio codecs): a real
  * deployment swaps [[Multimodal.decodeStub]] for a JPEG/PCM decoder with
  * the same signature; everything around it — the schema, the
  * per-partition batch loop, the partitioning — is the real plumbing and
  * is what the tests pin down.
  *
  * Scale: feature extraction is `mapPartitions` over batches of
  * [[Multimodal.BatchSize]] assets, the Arrow-style shape a Python
  * `mapInPandas` worker would see; no shuffle is introduced — partition
  * by `kind` upstream if decoders are heterogeneous (GPU vs CPU pools).
  */
object Multimodal {

  val BatchSize = 64
  val FeatureDim = 16

  /** STUB for the real media decoder: deterministic 16-bin byte histogram
    * normalized by length. Signature and batch usage match a real
    * decode-to-embedding step; only the math is fake. */
  def decodeStub(content: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](FeatureDim)
    if (content.nonEmpty) {
      content.foreach { b => hist((b & 0xFF) / FeatureDim) += 1f }
      var i = 0
      while (i < FeatureDim) { hist(i) /= content.length; i += 1 }
    }
    hist
  }

  /** Fake "resize": crop/pad the feature to `dim` — stands in for image
    * resize keeping the batched, length-stable output contract. */
  def resizeStub(feature: Array[Float], dim: Int): Array[Float] =
    feature.take(dim).padTo(dim, 0f)

  /** Frame sampling for video-kind assets: every `stride`-th
    * `frameBytes`-sized block, as (frame_idx, bytes). */
  def sampleFrames(content: Array[Byte], frameBytes: Int,
                   stride: Int): Seq[(Int, Array[Byte])] = {
    // fail fast with the bad parameter's name: a zero stride would
    // otherwise surface as a bare ArithmeticException mid-task
    require(frameBytes > 0, s"frameBytes must be positive, got $frameBytes")
    require(stride > 0, s"stride must be positive, got $stride")
    content.grouped(frameBytes).zipWithIndex.collect {
      case (blk, i) if i % stride == 0 => (i, blk)
    }.toSeq
  }

  /** Batched per-partition feature extraction — the mapInPandas-shaped
    * loop: drain the partition in BatchSize groups, decode each batch,
    * emit typed features. */
  def extractFeatures(assets: Dataset[MediaAsset]): Dataset[MediaFeature] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.map { a =>
          MediaFeature(a.asset_id, a.kind, a.content.length.toLong,
            decodeStub(a.content))
        }
      }
    }
  }

  /** Derive a deterministic asset table from the documents corpus (text
    * bytes stand in for media bytes; metadata is a pure function of size
    * so the oracle can replay it). */
  def assetsFromDocuments(docs: DataFrame): DataFrame = {
    val bytes = col("text").cast("binary")
    val n = octet_length(col("text"))
    val kind = when(col("doc_id") % 3 === 0, "image")
      .when(col("doc_id") % 3 === 1, "audio").otherwise("video")
    docs.select(
      col("doc_id").cast("long").as("asset_id"),
      kind.as("kind"),
      bytes.as("content"),
      struct(
        when(kind === "image", n % 640).otherwise(0).cast("int").as("width"),
        when(kind === "image", n % 480).otherwise(0).cast("int").as("height"),
        when(kind === "audio", lit(16000)).otherwise(0).cast("int").as("sample_rate"),
        when(kind =!= "image", n * 40L).otherwise(0L).as("duration_ms"),
        when(kind === "image", "png").when(kind === "audio", "wav")
          .otherwise("mkv").as("format")
      ).as("meta"))
  }
}
