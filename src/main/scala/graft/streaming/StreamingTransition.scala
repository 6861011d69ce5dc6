package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.EventAnalytics

/** Continuous transition-matrix maintenance: fold each micro-batch of
  * events through [[EventAnalytics.transitionMatrixIncremental]], keeping
  * TWO durable artifacts — the per-user last-event state (4 columns:
  * user, last_type, last_ts, last_tie) that stitches boundary-crossing
  * pairs, and the additive (from_type, to_type, n) transition census the
  * report reads — the family's durable form, slotting into the
  * [[VersionedState]] chain exactly as [[StreamingSessionize]] does for
  * sessions and [[StreamingLineCensus]] for line counts.
  *
  * Both chains are replay-idempotent independently: a replayed batch
  * recomputes its version from each chain's predecessor STRICTLY below
  * the batch id, so a crash between the census commit and the state
  * commit re-runs the batch against the same predecessors and rewrites
  * both versions identically — no double-count window exists. The census
  * commits FIRST (delivery-before-state, [[StreamingSessionize]]'s
  * ordering): a failure after the census but before the state replays
  * into identical artifacts.
  *
  * Micro-batches must be time-partitioned per user in (ts, tie) order —
  * the operator's raise_error enforces it row-lazily, including on an
  * exactly duplicated boundary (ts, tie), where the full window's order
  * would be nondeterministic.
  */
object StreamingTransition {

  /** The committed per-user last-event state, if any batch committed. */
  def latestState(spark: SparkSession, stateDir: String): Option[DataFrame] =
    StreamingUpsert.latestState(spark, stateDir)

  /** The committed transition census (from_type, to_type, n). */
  def latestCensus(spark: SparkSession,
                   censusDir: String): Option[DataFrame] =
    StreamingUpsert.latestState(spark, censusDir)

  /** Idempotent fold of one micro-batch into census + state. */
  def foldBatch(batch: DataFrame, batchId: Long, stateDir: String,
                censusDir: String, tsUs: DataFrame => Column,
                userCol: String = "user_id",
                typeCol: String = "event_type",
                tieCol: String = "event_id"): Unit =
    graft.CacheBarriers.withScope {
      val spark = batch.sparkSession
      val svs = VersionedState.versions(spark, stateDir)
      VersionedState.requireNoNewerThan(svs, stateDir, batchId)
      val prev = svs.find(_ < batchId)
        .map(v => spark.read.parquet(s"$stateDir/v$v"))
        // tie/user types derived from THIS batch's schema — a hardcoded
        // default makes the first fold of a non-long tie (or user)
        // column an AnalysisException at the state union
        .getOrElse(EventAnalytics.emptyTransitionState(spark, userCol,
          batch.schema(tieCol).dataType, batch.schema(userCol).dataType))
      val (delta, state) = EventAnalytics.transitionMatrixIncremental(
        batch, prev, tsUs(batch), userCol, typeCol, tieCol)
      val cvs = VersionedState.versions(spark, censusDir)
      VersionedState.requireNoNewerThan(cvs, censusDir, batchId)
      val census = cvs.find(_ < batchId)
        .map(v => spark.read.parquet(s"$censusDir/v$v"))
        .map(EventAnalytics.mergeTransitionCounts(_, delta))
        .getOrElse(delta)
      census.write.mode("overwrite").parquet(s"$censusDir/v$batchId")
      VersionedState.gcBefore(spark, censusDir, batchId, cvs)
      state.write.mode("overwrite").parquet(s"$stateDir/v$batchId")
      VersionedState.gcBefore(spark, stateDir, batchId, svs)
    }

  // ── The 100 TB state shape ────────────────────────────────────────────

  /** [[foldBatch]] with the USER-cardinality last-event state in the
    * [[BucketedState]] layout — the state is one row per user (billions
    * at web scale), so the global chain's whole-table rewrite per batch
    * has exactly the flaw the session state had before its bucketed
    * form. The batch reads ONLY the buckets its users hash into,
    * stitches through the same operator, and commits per-bucket versions
    * with a per-user max-by combine on (last_ts, last_tie) — sound
    * because the time-partitioning contract (now strict: equality
    * raises) makes a user's newer state row strictly greater on that
    * pair, so max-by is the mergeable partial the replay protocol
    * requires, and a carried (identical) row merges to itself; last_type
    * rides the winning struct. The census stays a GLOBAL chain: it is
    * type-pair-cardinality (config-sized), where bucketing would buy
    * nothing and cost a listing per bucket. */
  def foldBatchBucketed(batch: DataFrame, batchId: Long, stateDir: String,
                        censusDir: String, tsUs: DataFrame => Column,
                        numBuckets: Int = 64,
                        userCol: String = "user_id",
                        typeCol: String = "event_type",
                        tieCol: String = "event_id"): Unit =
    graft.CacheBarriers.withScope {
      val spark = batch.sparkSession
      BucketedState.ensureMeta(spark, stateDir, numBuckets)
      val events = graft.CacheBarriers.barrier(batch)
      val touched = events
        .select(BucketedState.bucketOf(col(userCol), numBuckets).as("b"))
        .filter(col("b").isNotNull).distinct()
        .collect().map(_.getLong(0)).sorted
      val prev = touched.toSeq.flatMap { b =>
        val d = s"$stateDir/b$b"
        VersionedState.versions(spark, d).find(_ < batchId)
          .map(v => spark.read.parquet(s"$d/v$v"))
      }.reduceOption(_.unionByName(_))
        .getOrElse(EventAnalytics.emptyTransitionState(spark, userCol,
          events.schema(tieCol).dataType, events.schema(userCol).dataType))
      val (delta, state) = EventAnalytics.transitionMatrixIncremental(
        events, prev, tsUs(events), userCol, typeCol, tieCol)
      val cvs = VersionedState.versions(spark, censusDir)
      VersionedState.requireNoNewerThan(cvs, censusDir, batchId)
      val census = cvs.find(_ < batchId)
        .map(v => spark.read.parquet(s"$censusDir/v$v"))
        .map(EventAnalytics.mergeTransitionCounts(_, delta))
        .getOrElse(delta)
      census.write.mode("overwrite").parquet(s"$censusDir/v$batchId")
      VersionedState.gcBefore(spark, censusDir, batchId, cvs)
      BucketedState.mergeBatchWith(
        state.select(col(userCol), col("last_type"), col("last_ts"),
          col("last_tie")),
        batchId, stateDir, numBuckets, keyCol = userCol) { df =>
        df.groupBy(col(userCol)).agg(
          max_by(struct(col("last_type"), col("last_ts"), col("last_tie")),
            struct(col("last_ts"), col("last_tie"))).as("__s"))
          .select(col(userCol), col("__s.*"))
      }
    }

  /** The committed bucketed state (union of bucket latests). */
  def latestStateBucketed(spark: SparkSession,
                          stateDir: String): Option[DataFrame] =
    BucketedState.latestState(spark, stateDir)

  /** Start the stream. Census-over-the-stream's-lifetime equals the full
    * batch [[EventAnalytics.transitionMatrix]] counts of everything
    * ingested — the q155 identity, continuously. */
  def start(events: DataFrame, stateDir: String, censusDir: String,
            checkpointDir: String, tsUs: DataFrame => Column,
            userCol: String = "user_id", typeCol: String = "event_type",
            tieCol: String = "event_id",
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        foldBatch(batch, batchId, stateDir, censusDir, tsUs, userCol,
          typeCol, tieCol)
      }
      .start()
}
