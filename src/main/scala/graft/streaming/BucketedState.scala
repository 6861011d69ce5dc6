package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Upsert

/** The 100 TB shape of [[StreamingUpsert]]'s durable state: state bucketed
  * by `hash(id)`, so a micro-batch rewrites ONLY the buckets it touches
  * instead of the whole table. [[StreamingUpsert.mergeBatch]] rewrites
  * full state per batch — correct while state fits a few GB; at terabyte
  * state the rewrite dominates. Here each bucket keeps its own version
  * chain `stateDir/b<bucket>/v<batchId>`:
  *
  *  - a batch groups by bucket, and per touched bucket merges the bucket's
  *    latest version strictly below the batch id with the batch slice —
  *    the same idempotent versioned-merge contract as the global path
  *    (a replayed batch merges against its predecessor, never its own
  *    partial output), now per bucket;
  *  - untouched buckets are not read, not written, not listed;
  *  - reading full state unions each bucket's latest version — on a real
  *    cluster each bucket is its own partition subtree, so point lookups
  *    and delete-meta reads prune to one bucket.
  *
  * The reference's analog is MongoDB collections as state (T6) — which
  * also only touches the documents a batch writes.
  */
object BucketedState {

  private val VersionRe = "^v(\\d+)$".r

  def bucketOf(id: org.apache.spark.sql.Column, numBuckets: Int) =
    pmod(xxhash64(id), lit(numBuckets.toLong))

  private def versions(spark: SparkSession, dir: String): Seq[Long] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.flatMap(_.getPath.getName match {
      case VersionRe(n) => Some(n.toLong)
      case _ => None
    }).sorted.reverse
  }

  private def latestBucket(spark: SparkSession, stateDir: String, bucket: Long,
                           beforeBatch: Long): Option[DataFrame] = {
    val dir = s"$stateDir/b$bucket"
    versions(spark, dir).find(_ < beforeBatch)
      .map(v => spark.read.parquet(s"$dir/v$v"))
  }

  /** Idempotent per-bucket merge of one micro-batch. */
  def mergeBatch(batch: DataFrame, batchId: Long, stateDir: String,
                 numBuckets: Int = 64): Unit = {
    val spark = batch.sparkSession
    val bucketed = batch
      .withColumn("__bucket", bucketOf(col("id"), numBuckets))
      .persist()
    try {
      val touched = bucketed.select("__bucket").distinct()
        .collect().map(_.getLong(0)).sorted
      touched.foreach { b =>
        val slice = bucketed.filter(col("__bucket") === b).drop("__bucket")
        val prev = latestBucket(spark, stateDir, b, beforeBatch = batchId)
        val merged = Upsert.lastWriterWins(
          prev.map(_.unionByName(slice)).getOrElse(slice))
        merged.write.mode("overwrite").parquet(s"$stateDir/b$b/v$batchId")
        // GC: keep this version + predecessor (crash-recovery window)
        val dir = s"$stateDir/b$b"
        val p = new Path(dir)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        versions(spark, dir).filter(_ < batchId).drop(1)
          .foreach(v => fs.delete(new Path(s"$dir/v$v"), true))
      }
    } finally bucketed.unpersist()
  }

  /** Full state: each bucket's latest version, unioned. */
  def latestState(spark: SparkSession, stateDir: String): Option[DataFrame] = {
    val p = new Path(stateDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val frames = fs.listStatus(p).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("b"))
      .flatMap { st =>
        val dir = st.getPath.toString
        versions(spark, dir).headOption.map(v => spark.read.parquet(s"$dir/v$v"))
      }
    frames.reduceOption(_.unionByName(_))
  }

  /** Live view (winners that are not tombstones), like
    * [[StreamingUpsert.liveState]]. */
  def liveState(spark: SparkSession, stateDir: String): DataFrame =
    latestState(spark, stateDir)
      .map(_.filter(col("operation") =!= "d"))
      .getOrElse(spark.emptyDataFrame)
}
