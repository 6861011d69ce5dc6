package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.llm.Curation
import graft.llm.Curation.CurationArtifacts

/** Streaming twin of the incremental curation composite
  * ([[Curation.curateIncremental]]): a document stream curated batch by
  * batch against DURABLE artifacts, with checkpoint/resume — the
  * continuous form of the daily-ingest loop, riding the same
  * versioned-state protocol as [[StreamingUpsert]] (`v<batchId>` +
  * commit marker, merge-against-predecessor, GC to the crash window).
  *
  * Layout under `stateDir`:
  *  - `v<batchId>/` — the full artifact set AFTER that batch
  *    ([[Curation.writeArtifacts]]), committed by a `_SUCCESS` marker
  *    written LAST (a crash mid-write leaves no marker and recovery
  *    reads the intact predecessor).
  *  - `kept/b<batchId>/` — that batch's kept slice, overwrite-mode so a
  *    replayed batch rewrites its own output deterministically
  *    (at-least-once → exactly-once content). Kept slices are OUTPUT,
  *    not state: GC never touches them, and with batch-monotone ids the
  *    union over slices equals a full `curate` over everything ingested
  *    (verdicts of earlier docs are stable because representatives are
  *    min-id — pinned by StreamingIncrementalCurationSpec).
  *
  * Scale shape: each batch touches (new batch) × (artifact) only — the
  * old corpus is never re-read; every version write is a lineage cut,
  * so plans do not compound across batches. Like [[StreamingUpsert]],
  * the artifact rewrite per version is the fits-in-storage-budget
  * trade; [[BucketedCuration]] is the 100 TB form — same contract with
  * the corpus-sized artifact tables in [[BucketedState]]'s hash-bucketed
  * layout, so a micro-batch rewrites only the buckets it touches. */
object StreamingCuration {

  private def marker(spark: SparkSession, dir: String): Unit =
    VersionedState.commitMarker(spark, dir)
  // (alias kept for readability at the three call sites below)

  /** Seed the state with the bootstrap corpus BEFORE the stream starts
    * (version -1, the [[StreamingUpsert.seedState]] convention: batch 0
    * merges against it). Writes the bootstrap's kept slice as
    * `kept/b-1`. */
  def bootstrap(docs: DataFrame, stateDir: String,
                idCol: String = "doc_id", textCol: String = "text",
                sourceCol: Option[String] = None,
                lineMinChars: Int = 10,
                classifier: Option[graft.llm.QualityModel.LocalClassifier] = None,
                trainQuality: Boolean = false): Unit =
    graft.CacheBarriers.withScope {
      // scoped like mergeBatch: artifactsOf registers operator-internal
      // barriers, and a bootstrap outside any scope would pin the whole
      // bootstrap corpus's cached frames in the session-global registry
      // for the life of the ingest session
      val spark = docs.sparkSession
      val (kept, art) = Curation.artifactsOf(docs, idCol, textCol, sourceCol,
        lineMinChars, classifier, trainQuality)
      Curation.writeArtifacts(art, s"$stateDir/v-1")
      kept.write.mode("overwrite").parquet(s"$stateDir/kept/b-1")
      marker(spark, s"$stateDir/v-1")
    }

  /** Idempotent curation of one micro-batch against the predecessor
    * version's artifacts. */
  def mergeBatch(batch: DataFrame, batchId: Long, stateDir: String,
                 idCol: String = "doc_id", textCol: String = "text",
                 sourceCol: Option[String] = None,
                 lineMinChars: Int = 10,
                 classifier: Option[graft.llm.QualityModel.LocalClassifier] = None): Unit = graft.CacheBarriers.withScope {
    // withScope: this batch's operator-internal barriers are registered
    // to a scope owned by this call and released when the block exits
    // (everything is on storage by then), so a long-lived ingest stream
    // doesn't accrete cached tables batch over batch — WITHOUT touching
    // any other pipeline's barriers in a shared session (a global
    // releaseAll here would unpersist their in-flight frames)
    val spark = batch.sparkSession
    val vs = VersionedState.versions(spark, stateDir)
    VersionedState.requireNoNewerThan(vs, stateDir, batchId)
    val prev = vs.find(_ < batchId).getOrElse(throw new IllegalStateException(
      s"StreamingCuration: no committed artifacts below batch $batchId in " +
        s"$stateDir — run bootstrap() (or seed v-1) before streaming"))
    val art = Curation.readArtifacts(spark, s"$stateDir/v$prev")
    val (kept, art2) = Curation.curateIncremental(batch, art, idCol,
      textCol, sourceCol, lineMinChars, classifier)
    Curation.writeArtifacts(art2, s"$stateDir/v$batchId")
    kept.write.mode("overwrite").parquet(s"$stateDir/kept/b$batchId")
    // marker LAST: the version is invisible until everything above is
    // fully on storage (same torn-write fence as the parquet job commit
    // VersionedState leans on elsewhere)
    marker(spark, s"$stateDir/v$batchId")
    VersionedState.gcBefore(spark, stateDir, batchId, vs)
  }

  /** Continuous form: document stream → per-batch incremental curation
    * into the durable artifact chain. */
  def start(docs: DataFrame, stateDir: String, checkpointDir: String,
            idCol: String = "doc_id", textCol: String = "text",
            sourceCol: Option[String] = None,
            lineMinChars: Int = 10,
            trigger: Trigger = Trigger.AvailableNow(),
            classifier: Option[graft.llm.QualityModel.LocalClassifier] = None): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeBatch(batch, batchId, stateDir, idCol, textCol, sourceCol,
          lineMinChars, classifier)
      }
      .start()

  /** The latest committed artifact set; None before bootstrap. */
  def latestArtifacts(spark: SparkSession,
                      stateDir: String): Option[CurationArtifacts] =
    VersionedState.versions(spark, stateDir).headOption
      .map(v => Curation.readArtifacts(spark, s"$stateDir/v$v"))

  /** The accumulated kept corpus: the union of every batch's kept slice
    * (including the bootstrap's). With batch-monotone ids this equals a
    * full-batch `curate` over everything ingested. */
  def keptCorpus(spark: SparkSession, stateDir: String): DataFrame =
    spark.read.parquet(s"$stateDir/kept/b*")
}
