package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.config.CurationConfig

/** The daemon's `--pipeline curation` mode — the LLM curation chain run
  * LIVE, the way the reference's hot path runs live (`--transport
  * --sink`): transport envelope → document mapping → heuristic gate →
  * exact + near-dup artifact merges → kept output slices, all through
  * [[BucketedCuration]]'s hash-bucketed state (a micro-batch rewrites
  * only the buckets its deltas touch; kill + restart resumes from the
  * checkpoint and replays idempotently — the [[BucketedState]]
  * contract).
  *
  * Envelope mapping (stated, config-tunable via `[curation]`): inserts
  * and updates with a JSON document body become curation docs with
  * `doc_id = CAST(id AS BIGINT)`, `text` = the configured JSON field,
  * `source` = the collection name. Deletes and non-numeric ids are
  * outside the curation contract (the artifact chain is append-only by
  * design — [[graft.llm.Curation.curateIncremental]]'s id contract) and
  * drop here, loudly visible in the census gap rather than corrupting
  * the fold.
  *
  * Bootstrap: the state seeds ONCE from an EMPTY corpus before the
  * stream starts, so batch 0 takes the same idempotent mergeBatch path
  * as every later batch. Seeding from the first micro-batch instead
  * would break replay: a crash after the bootstrap but before the
  * checkpoint commit would re-deliver batch 0 into state that already
  * contains it, violating the append-only id contract. */
object CurationDaemon {

  /** Envelope → curation documents (the mapping the class doc states). */
  def docsOf(envelope: DataFrame, cc: CurationConfig): DataFrame =
    envelope
      .filter(col("operation").isin("i", "u") && col("document").isNotNull)
      .select(col("id").cast("long").as("doc_id"),
        get_json_object(col("document"), s"$$.${cc.textField}").as("text"),
        col("coll").as("source"))
      .filter(col("doc_id").isNotNull && col("text").isNotNull)

  /** The curation-doc schema the empty bootstrap seeds with. */
  private def emptyDocs(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType),
        StructField("source", StringType))))

  /** Seed the stores from an empty corpus unless already bootstrapped
    * (idempotent across daemon restarts — the small/ chain is the
    * committed-state signal). */
  def ensureBootstrapped(spark: SparkSession, stateDir: String,
                         cc: CurationConfig): Unit =
    if (VersionedState.versions(spark, s"$stateDir/small").isEmpty)
      BucketedCuration.bootstrap(emptyDocs(spark), stateDir,
        cc.numBuckets, sourceCol = Some("source"),
        lineMinChars = cc.lineMinChars)

  /** Wire and start the live pipeline over an envelope stream. */
  def start(envelope: DataFrame, stateDir: String, checkpointDir: String,
            cc: CurationConfig,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    ensureBootstrapped(envelope.sparkSession, stateDir, cc)
    BucketedCuration.start(docsOf(envelope, cc), stateDir, checkpointDir,
      cc.numBuckets, sourceCol = Some("source"),
      lineMinChars = cc.lineMinChars, trigger = trigger)
  }
}
