package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.llm.Similarity

/** Continuous per-label centroid maintenance: fold each embedding
  * micro-batch's integer centroid sums ([[Similarity.labelCentroidSums]])
  * into a versioned artifact, so outlier scoring
  * ([[Similarity.scoreAgainstCentroidSums]]) always runs against
  * centroids that reflect everything ingested — without re-reading any
  * old corpus. Long sums of `floor(x·1e6)` are associative and
  * commutative, so the rolled-forward artifact is EXACTLY the
  * full-union's ([[Similarity.mergeCentroidSums]]), not an approximation
  * — the same additive-artifact contract as the line census this twin
  * mirrors ([[StreamingLineCensus]]).
  *
  * State lives in a [[VersionedState]] parquet chain (`<dir>/v<batchId>`):
  * a replayed batch recomputes its version from the predecessor rather
  * than double-merging, the commit protocol keeps torn writes invisible,
  * and the stale-checkpoint guard fails loudly. The artifact is
  * labels×dims rows — control-plane-sized, so the whole-table rewrite
  * per batch is the right shape at any corpus scale (the artifact does
  * not grow with the corpus, only with the label set). */
object StreamingCentroidSums {

  /** The current committed sums artifact (labelCol, pos, s, n), if any
    * batch committed. */
  def latestSums(spark: SparkSession, sumsDir: String): Option[DataFrame] =
    StreamingUpsert.latestState(spark, sumsDir)

  /** Idempotent fold of one micro-batch of embeddings into the sums. */
  def mergeBatch(batch: DataFrame, batchId: Long, sumsDir: String,
                 vecCol: String = "embedding",
                 labelCol: String = "label"): Unit = {
    val spark = batch.sparkSession
    val vs = VersionedState.versions(spark, sumsDir)
    VersionedState.requireNoNewerThan(vs, sumsDir, batchId)
    val batchSums = Similarity.labelCentroidSums(batch, vecCol, labelCol)
    val merged = vs.find(_ < batchId)
      .map(v => spark.read.parquet(s"$sumsDir/v$v"))
      .map(prev => Similarity.mergeCentroidSums(prev, batchSums, labelCol))
      .getOrElse(batchSums)
    merged.write.mode("overwrite").parquet(s"$sumsDir/v$batchId")
    VersionedState.gcBefore(spark, sumsDir, batchId, vs)
  }

  /** Start the stream. After each batch's fold commits, `onSums` gets
    * the updated artifact and the batch id — e.g. to re-score the batch
    * itself or republish frozen centroids for a downstream gate. It must
    * materialize what it reads before returning (the GC window deletes
    * the version two batches later — the [[StreamingLineCensus]]
    * `onCensus` contract). */
  def start(vectors: DataFrame, sumsDir: String, checkpointDir: String,
            onSums: (DataFrame, Long) => Unit = (_, _) => (),
            vecCol: String = "embedding", labelCol: String = "label",
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    vectors.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeBatch(batch, batchId, sumsDir, vecCol, labelCol)
        onSums(latestSums(batch.sparkSession, sumsDir).get, batchId)
      }
      .start()
}
