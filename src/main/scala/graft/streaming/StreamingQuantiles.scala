package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.llm.Quantiles

/** Continuous per-source quantile maintenance: fold each document
  * micro-batch's score histogram ([[Quantiles.scoreHistogram]]) into a
  * versioned artifact, so per-source quantile thresholds
  * ([[Quantiles.binThresholds]]) always reflect everything ingested —
  * without re-reading any old corpus. Long bin counts are additive
  * ([[Quantiles.mergeHistograms]]), so the rolled-forward histogram is
  * EXACTLY the full-union's — the same contract as the line census and
  * centroid sums this twin completes the set with.
  *
  * State lives in a [[VersionedState]] parquet chain: replay recomputes
  * from the predecessor (never double-merges), torn writes stay
  * invisible, stale checkpoints fail loudly. The artifact is
  * sources×bins rows — it grows with score RANGE and source count, not
  * with the corpus, so the whole-table rewrite per batch holds at any
  * scale. */
object StreamingQuantiles {

  /** The current committed histogram (sourceCol, bin, n), if any. */
  def latestHistogram(spark: SparkSession,
                      histDir: String): Option[DataFrame] =
    StreamingUpsert.latestState(spark, histDir)

  /** Idempotent fold of one micro-batch into the histogram. */
  def mergeBatch(batch: DataFrame, batchId: Long, histDir: String,
                 scoreCol: Column, binWidth: Long,
                 sourceCol: String = "source"): Unit = {
    val spark = batch.sparkSession
    val vs = VersionedState.versions(spark, histDir)
    VersionedState.requireNoNewerThan(vs, histDir, batchId)
    val batchHist = Quantiles.scoreHistogram(batch, scoreCol, binWidth,
      sourceCol)
    val merged = vs.find(_ < batchId)
      .map(v => spark.read.parquet(s"$histDir/v$v"))
      .map(prev => Quantiles.mergeHistograms(prev, batchHist, sourceCol))
      .getOrElse(batchHist)
    merged.write.mode("overwrite").parquet(s"$histDir/v$batchId")
    VersionedState.gcBefore(spark, histDir, batchId, vs)
  }

  /** Start the stream. After each fold commits, `onHistogram` gets the
    * updated artifact and batch id — e.g. to republish frozen quantile
    * thresholds for a downstream gate. It must materialize what it
    * reads before returning (the GC-window contract of
    * [[StreamingLineCensus]]'s `onCensus`). */
  def start(docs: DataFrame, histDir: String, checkpointDir: String,
            scoreCol: Column, binWidth: Long,
            onHistogram: (DataFrame, Long) => Unit = (_, _) => (),
            sourceCol: String = "source",
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeBatch(batch, batchId, histDir, scoreCol, binWidth, sourceCol)
        onHistogram(latestHistogram(batch.sparkSession, histDir).get,
          batchId)
      }
      .start()
}
