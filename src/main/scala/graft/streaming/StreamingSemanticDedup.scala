package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.llm.{Dedup, Similarity}

/** Streaming twin of [[Similarity.semanticDedupIncremental]]: an
  * embedding stream deduped batch by batch against a DURABLE IVF index +
  * cluster artifact — the continuous form of the daily semantic-dedup
  * ingest, riding the same versioned-state protocol as
  * [[StreamingCuration]] (`v<batchId>` + commit marker,
  * merge-against-predecessor, GC to the crash window).
  *
  * Layout under `stateDir`:
  *  - `index/` — the bucket-partitioned IVF index, APPEND-ONLY
  *    ([[Similarity.appendToIndex]]): probe geometry is frozen at
  *    bootstrap (the `_centroids` invariant) and the `_ids` manifest
  *    makes re-delivered batches no-ops, so the index needs no
  *    versioning of its own.
  *  - `v<batchId>/clusters` — the cluster artifact AFTER that batch,
  *    committed by a marker written LAST.
  *  - `decisions/b<batchId>/` — that batch's keep/drop slice,
  *    overwrite-mode (at-least-once replay rewrites it
  *    deterministically).
  *
  * Replay safety has one extra argument beyond the marker fence: a
  * crash AFTER the index append but BEFORE the marker replays the batch
  * against an index that already CONTAINS it. That changes nothing —
  * each batch vector then meets itself and its batch near-dups on the
  * index side too, but a self-pair is a CC no-op and a batch-mate pair
  * through the index duplicates the in-batch pair (the batch mate has
  * no persisted label yet, so contraction maps it to itself, the same
  * edge) — decisions and artifact come out identical. The one
  * deliberate asymmetry vs the batch operator: the decide step runs
  * BEFORE the append, so the common path never reads the batch from
  * the index at all. A crash INSIDE the append (index data landed, the
  * `_ids` manifest did not) is detected on replay by the uncommitted
  * version directory and healed with `rebuildIdManifest` before the
  * re-append — without it the anti-join would re-admit the batch as
  * duplicate index rows.
  *
  * Scale shape: per batch, (new batch) × (touched buckets) only — the
  * standing corpus is read through partition pruning, the cluster
  * artifact is pair-graph-sized, and every version write is a lineage
  * cut, so plans never compound across batches. */
object StreamingSemanticDedup {

  /** Seed the state BEFORE the stream starts: build the index (frozen
    * centroids from `centroidPred` over the bootstrap corpus), run the
    * full [[Similarity.semanticDedup]] once, persist its cluster table
    * as version -1 and its decisions as `decisions/b-1`. */
  def bootstrap(vectors: DataFrame, stateDir: String,
                centroidPred: org.apache.spark.sql.Column, minCos: Double,
                idCol: String = "vec_id",
                vecCol: String = "embedding"): Unit =
    graft.CacheBarriers.withScope {
      val spark = vectors.sparkSession
      Similarity.buildIndex(vectors,
        Similarity.collectCentroids(vectors.filter(centroidPred), idCol,
          vecCol),
        s"$stateDir/index", idCol, vecCol)
      val clusters = Dedup.dupClusters(
        Similarity.embeddingNearDupPairs(vectors, centroidPred, minCos,
          idCol, vecCol))
        .select(col("doc_id"), col("cluster_id"))
      val decisions = Similarity.decorateClusters(vectors, clusters, idCol)
      decisions.write.mode("overwrite")
        .parquet(s"$stateDir/decisions/b-1")
      clusters.write.mode("overwrite").parquet(s"$stateDir/v-1/clusters")
      VersionedState.commitMarker(spark, s"$stateDir/v-1")
    }

  /** Idempotent semantic dedup of one micro-batch against the
    * predecessor version's artifact. */
  def mergeBatch(batch: DataFrame, batchId: Long, stateDir: String,
                 minCos: Double, idCol: String = "vec_id",
                 vecCol: String = "embedding"): Unit =
    graft.CacheBarriers.withScope {
      val spark = batch.sparkSession
      val vs = VersionedState.versions(spark, stateDir)
      VersionedState.requireNoNewerThan(vs, stateDir, batchId)
      val prev = vs.find(_ < batchId).getOrElse(
        throw new IllegalStateException(
          s"StreamingSemanticDedup: no committed artifact below batch " +
            s"$batchId in $stateDir — run bootstrap() before streaming"))
      // torn-append recovery: an UNCOMMITTED v<batchId> directory means a
      // prior attempt at this batch crashed after its artifact writes
      // began — possibly inside appendToIndex between the index-data
      // append and the `_ids` manifest append. A stale manifest would let
      // the replay's anti-join re-admit the whole batch as duplicate
      // index rows (each one silently eating a probe's top-k slot
      // forever), so rebuild the manifest from the data files first —
      // appendToIndex's own documented recovery, run automatically on
      // the one path that replays automatically. Clean first attempts
      // never pay the rebuild scan.
      val attemptDir = new org.apache.hadoop.fs.Path(s"$stateDir/v$batchId")
      val fs = attemptDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(attemptDir))
        Similarity.rebuildIdManifest(spark, s"$stateDir/index", idCol)
      val oldClusters = spark.read.parquet(s"$stateDir/v$prev/clusters")
      val (decisions, updated) = Similarity.semanticDedupIncremental(
        batch, s"$stateDir/index", oldClusters, minCos, idCol, vecCol)
      decisions.write.mode("overwrite")
        .parquet(s"$stateDir/decisions/b$batchId")
      updated.write.mode("overwrite")
        .parquet(s"$stateDir/v$batchId/clusters")
      // index append AFTER the decide step (see the replay argument in
      // the object doc), BEFORE the marker so a committed version never
      // precedes its own index rows
      Similarity.appendToIndex(batch, s"$stateDir/index", idCol, vecCol)
      VersionedState.commitMarker(spark, s"$stateDir/v$batchId")
      VersionedState.gcBefore(spark, stateDir, batchId, vs)
    }

  /** Continuous form: embedding stream → per-batch incremental semantic
    * dedup into the durable state chain. */
  def start(vectors: DataFrame, stateDir: String, checkpointDir: String,
            minCos: Double, idCol: String = "vec_id",
            vecCol: String = "embedding",
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    vectors.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeBatch(batch, batchId, stateDir, minCos, idCol, vecCol)
      }
      .start()

  /** The latest committed cluster artifact; None before bootstrap. */
  def latestClusters(spark: SparkSession,
                     stateDir: String): Option[DataFrame] =
    VersionedState.versions(spark, stateDir).headOption
      .map(v => spark.read.parquet(s"$stateDir/v$v/clusters"))

  /** Every batch's decisions (including the bootstrap's): one row per
    * ingested vector. With batch-unique ids this equals a full
    * [[Similarity.semanticDedup]] over everything ingested, modulo the
    * append-only verdict contract (earlier batches' keeps stand). */
  def allDecisions(spark: SparkSession, stateDir: String): DataFrame =
    spark.read.parquet(s"$stateDir/decisions/b*")
}
