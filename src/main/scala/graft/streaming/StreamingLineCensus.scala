package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.llm.Dedup

/** Continuous corpus line census: maintain the persisted boilerplate
  * census ([[Dedup.lineCensus]]) as documents stream in, so line-dedup
  * decisions ([[Dedup.lineDedup]]'s `n_docs >= minCount` set) stay
  * current without ever re-reading the old corpus — per-hash counts are
  * additive across batches ([[Dedup.mergeLineCensus]]), so each
  * micro-batch costs its own census plus a census-sized merge.
  *
  * State lives in a [[VersionedState]] parquet chain (`<dir>/v<batchId>`):
  * a REPLAYED batch recomputes its version from the predecessor state
  * rather than double-merging, the `_SUCCESS` commit protocol keeps torn
  * writes invisible, and the stale-checkpoint guard fails loudly instead
  * of resurrecting old counts. The append-only contract of
  * `mergeLineCensus` (batch doc ids previously unseen) carries over:
  * this is the census for an ever-growing corpus, not an updateable one.
  */
object StreamingLineCensus {

  /** The current committed census (lh, n_docs), if any batch committed. */
  def latestCensus(spark: SparkSession, censusDir: String): Option[DataFrame] =
    StreamingUpsert.latestState(spark, censusDir)

  /** Idempotent fold of one micro-batch of documents into the census.
    * One directory listing serves the guard, the predecessor lookup, and
    * the GC — the same single-listing shape as the other merge paths. */
  def mergeBatch(batch: DataFrame, batchId: Long, censusDir: String,
                 idCol: String = "doc_id", textCol: String = "text",
                 minChars: Int = 10): Unit = {
    val spark = batch.sparkSession
    val vs = VersionedState.versions(spark, censusDir)
    VersionedState.requireNoNewerThan(vs, censusDir, batchId)
    val merged = vs.find(_ < batchId)
      .map(v => spark.read.parquet(s"$censusDir/v$v"))
      .map(prev => Dedup.mergeLineCensus(prev, batch, idCol, textCol,
        minChars))
      .getOrElse(Dedup.lineCensus(batch, idCol, textCol, minChars))
    merged.write.mode("overwrite").parquet(s"$censusDir/v$batchId")
    VersionedState.gcBefore(spark, censusDir, batchId, vs)
  }

  /** The 100 TB census shape: the census bucketed by `hash(lh)`
    * ([[BucketedState]]'s layout with an ADDITIVE combine), so a batch
    * rewrites only the buckets its own lines hash into — the global
    * [[mergeBatch]] rewrites the whole census per batch, which is right
    * while the census fits a few GB and wrong at web scale, where the
    * census is billions of rows and a daily batch touches a sliver.
    * Same versioned-merge idempotence per bucket (sums are mergeable
    * partials), same `_meta` bucket-count pin, same append-only and
    * same-minChars contracts as the global path. */
  def mergeBatchBucketed(batch: DataFrame, batchId: Long, censusDir: String,
                         numBuckets: Int = 64, idCol: String = "doc_id",
                         textCol: String = "text",
                         minChars: Int = 10): Unit = {
    import org.apache.spark.sql.functions.{col, sum}
    BucketedState.mergeBatchWith(
      Dedup.lineCensus(batch, idCol, textCol, minChars),
      batchId, censusDir, numBuckets, keyCol = "lh")(
      _.groupBy(col("lh")).agg(sum(col("n_docs")).as("n_docs")))
  }

  /** The committed bucketed census (union of bucket latests). */
  def latestCensusBucketed(spark: SparkSession,
                           censusDir: String): Option[DataFrame] =
    BucketedState.latestState(spark, censusDir)

  /** Start the stream. After each batch's fold commits, `onCensus` gets
    * the updated census frame and the batch id — e.g. to refresh a
    * broadcast boilerplate set or republish the `>= minCount` drop list.
    * `onCensus` must materialize the frame (write/collect) before
    * returning: it reads the version the GC window deletes two batches
    * later, so a deferred read can hit FileNotFoundException (the same
    * contract as [[StreamingDecontam]]'s `onPairs`). */
  def start(docs: DataFrame, censusDir: String, checkpointDir: String,
            onCensus: (DataFrame, Long) => Unit = (_, _) => (),
            idCol: String = "doc_id", textCol: String = "text",
            minChars: Int = 10,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeBatch(batch, batchId, censusDir, idCol, textCol, minChars)
        onCensus(latestCensus(batch.sparkSession, censusDir).get, batchId)
      }
      .start()
}
