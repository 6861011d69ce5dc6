package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Shared mechanics for versioned parquet state directories
  * (`<dir>/v<batchId>`), used by [[StreamingUpsert]] (one global chain)
  * and [[BucketedState]] (one chain per bucket).
  *
  * Commit protocol: a version is COMMITTED iff Spark's `_SUCCESS`
  * job-commit marker exists inside it. A crash mid-write leaves a
  * directory without the marker (or with only `_temporary`), and every
  * reader here ignores such directories — so `latest*` can never select
  * a torn version over its intact predecessor. Writers get this for free
  * (parquet job commit creates `_SUCCESS` last).
  */
private[streaming] object VersionedState {

  private val VersionRe = "^v(-?\\d+)$".r

  def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Write the `_SUCCESS` commit marker for a MULTI-TABLE version dir —
    * one whose member tables each job-committed individually, so the
    * dir-level marker (what [[versions]] keys off) must be written
    * explicitly, LAST. Single-table versions get theirs from the parquet
    * job commit and never need this. */
  def commitMarker(spark: SparkSession, dir: String): Unit = {
    val p = new Path(dir, "_SUCCESS")
    fs(spark, dir).create(p, true).close()
  }

  /** Committed versions under `dir`, newest first. */
  def versions(spark: SparkSession, dir: String): Seq[Long] = {
    val p = new Path(dir)
    val f = fs(spark, dir)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq.flatMap { st =>
      st.getPath.getName match {
        case VersionRe(n) if f.exists(new Path(st.getPath, "_SUCCESS")) =>
          Some(n.toLong)
        case _ => None
      }
    }.sorted.reverse
  }

  /** A fresh checkpoint must not merge into a LATER state dir: committed
    * versions beyond the incoming batch id mean the state belongs to a
    * different (further-progressed) checkpoint, and merging would be
    * silently invisible to `latest*` until the batch ids catch up —
    * resurrecting stale state with no error anywhere. (A replayed batch
    * seeing its OWN version is fine: `<=`.) */
  def requireNoNewerThan(spark: SparkSession, dir: String, batchId: Long): Unit =
    requireNoNewerThan(versions(spark, dir), dir, batchId)

  /** As above over a pre-listed version set — merge paths list the
    * directory ONCE and thread the result through guard, predecessor
    * lookup, and GC: on object stores the listings, not the merge work,
    * dominate small batches (BucketedState multiplies them per touched
    * bucket). */
  def requireNoNewerThan(vs: Seq[Long], dir: String, batchId: Long): Unit = {
    val newer = vs.filter(_ > batchId)
    require(newer.isEmpty,
      s"state dir $dir already holds committed versions ${newer.mkString(",")} " +
        s"newer than batch $batchId — it belongs to a further-progressed " +
        "checkpoint; use a fresh state dir or restore the matching checkpoint")
  }

  /** GC: keep the newest version strictly below `batchId` (the
    * crash-recovery predecessor) and delete everything older. */
  def gcBefore(spark: SparkSession, dir: String, batchId: Long): Unit =
    gcBefore(spark, dir, batchId, versions(spark, dir))

  /** As above over a pre-listed version set (targets are strictly below
    * `batchId`, so a listing taken before this batch's own write is
    * exactly the GC candidate set). */
  def gcBefore(spark: SparkSession, dir: String, batchId: Long,
               vs: Seq[Long]): Unit = {
    val f = fs(spark, dir)
    vs.filter(_ < batchId).drop(1)
      .foreach(v => f.delete(new Path(s"$dir/v$v"), true))
  }
}
