package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.llm.Features

/** Continuous document-frequency census: maintain the persisted (wh, df)
  * artifact ([[Features.dfCensus]]) — plus its corpus doc count, riding
  * the same frame as [[Features.dfCensusWithCount]]'s NULL-key sentinel —
  * as documents stream in, so incremental TF-IDF featurization
  * ([[Features.hashedTfIdfVectors]] against the merged census, the q118
  * shape) always reads a current artifact without re-reading the old
  * corpus. Per-word distinct-doc counts and the doc count are both
  * additive across doc-id-DISJOINT batches ([[Features.mergeDfCensus]] —
  * a doc delivered in two batches double-counts), so each micro-batch
  * costs its own census plus a census-sized merge — and, in the bucketed
  * form, only the buckets its own words hash into.
  *
  * The census is vocabulary-sized (one row per distinct word), far
  * smaller than the span census's one-row-per-distinct-window — the
  * global [[mergeBatch]] form stays viable much longer here, but the
  * [[mergeBatchBucketed]] form is still the 100 TB shape (web-scale
  * vocabulary with typo/number/url tails runs to billions of rows).
  *
  * State lives in a [[VersionedState]] parquet chain (`<dir>/v<batchId>`):
  * a REPLAYED batch recomputes its version from the predecessor state
  * rather than double-merging, the `_SUCCESS` commit protocol keeps torn
  * writes invisible, and the stale-checkpoint guard fails loudly instead
  * of resurrecting old counts.
  */
object StreamingDfCensus {

  /** The current committed self-describing census, if any batch
    * committed. Split with [[Features.censusParts]]. */
  def latestCensus(spark: SparkSession, censusDir: String): Option[DataFrame] =
    StreamingUpsert.latestState(spark, censusDir)

  /** Idempotent fold of one micro-batch of documents into the census.
    * One directory listing serves the guard, the predecessor lookup, and
    * the GC. */
  def mergeBatch(batch: DataFrame, batchId: Long, censusDir: String,
                 idCol: String = "doc_id", textCol: String = "text"): Unit = {
    val spark = batch.sparkSession
    val vs = VersionedState.versions(spark, censusDir)
    VersionedState.requireNoNewerThan(vs, censusDir, batchId)
    val batchCensus = Features.dfCensusWithCount(batch, idCol, textCol)
    val merged = vs.find(_ < batchId)
      .map(v => spark.read.parquet(s"$censusDir/v$v"))
      .map(prev => Features.mergeDfCensus(prev, batchCensus))
      .getOrElse(batchCensus)
    merged.write.mode("overwrite").parquet(s"$censusDir/v$batchId")
    VersionedState.gcBefore(spark, censusDir, batchId, vs)
  }

  /** The 100 TB census shape: the census bucketed by `hash(wh)`
    * ([[BucketedState]]'s layout with an ADDITIVE combine), so a batch
    * rewrites only the buckets its own words hash into. The NULL-key
    * sentinel hashes to one fixed bucket (xxhash64 of NULL is the seed),
    * so the doc count rides one bucket's chain like any other key. Same
    * versioned-merge idempotence per bucket, same `_meta` bucket-count
    * pin, same doc-disjoint contract as the global path. */
  def mergeBatchBucketed(batch: DataFrame, batchId: Long, censusDir: String,
                         numBuckets: Int = 64, idCol: String = "doc_id",
                         textCol: String = "text"): Unit = {
    import org.apache.spark.sql.functions.{col, sum}
    BucketedState.mergeBatchWith(
      Features.dfCensusWithCount(batch, idCol, textCol),
      batchId, censusDir, numBuckets, keyCol = "wh")(
      _.groupBy(col("wh")).agg(sum(col("df")).as("df")))
  }

  /** The committed bucketed census (union of bucket latests). */
  def latestCensusBucketed(spark: SparkSession,
                           censusDir: String): Option[DataFrame] =
    BucketedState.latestState(spark, censusDir)

  /** Start the stream. After each batch's fold commits, `onCensus` gets
    * the updated self-describing census and the batch id — e.g. to
    * featurize the next ingest batch against it. `onCensus` must
    * materialize the frame before returning: it reads the version the GC
    * window deletes two batches later (the [[StreamingSpanCensus.start]]
    * contract). */
  def start(docs: DataFrame, censusDir: String, checkpointDir: String,
            onCensus: (DataFrame, Long) => Unit = (_, _) => (),
            idCol: String = "doc_id", textCol: String = "text",
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeBatch(batch, batchId, censusDir, idCol, textCol)
        onCensus(latestCensus(batch.sparkSession, censusDir).get, batchId)
      }
      .start()
}
