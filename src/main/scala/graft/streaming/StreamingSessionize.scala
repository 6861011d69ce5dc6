package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Sessionize

/** Continuous sessionization: maintain the per-user OPEN-session state
  * ([[Sessionize.sessionStatsIncremental]]) as events stream in, shipping
  * each micro-batch's CLOSED sessions downstream — the durable twin of
  * the q141 fold chain, riding the same [[VersionedState]] parquet
  * protocol as the census streams: a replayed batch recomputes its
  * version from the predecessor state (idempotent), `_SUCCESS` commits
  * keep torn writes invisible, and the stale-checkpoint guard fails
  * loudly.
  *
  * Ordering contract: `onClosed` runs BEFORE the state commit — a failed
  * sink means the batch replays and no state exists for unshipped
  * sessions (the [[StreamingSpanCensus]] cut ordering), so closed
  * sessions are delivered at-least-once and the state never gets ahead
  * of the deliveries. Micro-batches must be time-partitioned per user
  * (an append-only event log in arrival order); the operator's
  * row-lazy raise_error enforces it per user rather than trusting it.
  */
object StreamingSessionize {

  /** The committed open-session state, if any batch committed. */
  def latestState(spark: SparkSession, stateDir: String): Option[DataFrame] =
    StreamingUpsert.latestState(spark, stateDir)

  /** Idempotent fold of one micro-batch of events into the session
    * state; `onClosed` must materialize its frame before returning (it
    * reads versions the GC window deletes two batches later). */
  def foldBatch(batch: DataFrame, batchId: Long, stateDir: String,
                gapUs: Long, tsUs: DataFrame => Column,
                userCol: String = "user_id", tieCol: String = "event_id",
                onClosed: (DataFrame, Long) => Unit = (_, _) => ()): Unit =
    graft.CacheBarriers.withScope {
      val spark = batch.sparkSession
      val vs = VersionedState.versions(spark, stateDir)
      VersionedState.requireNoNewerThan(vs, stateDir, batchId)
      val prev = vs.find(_ < batchId)
        .map(v => spark.read.parquet(s"$stateDir/v$v"))
        .getOrElse(Sessionize.emptySessionState(spark, userCol))
      val (closed, state) = Sessionize.sessionStatsIncremental(
        batch, prev, gapUs, tsUs(batch), userCol, tieCol)
      onClosed(closed, batchId)
      state.write.mode("overwrite").parquet(s"$stateDir/v$batchId")
      VersionedState.gcBefore(spark, stateDir, batchId, vs)
    }

  /** Start the stream. Closed ∪ latest state over the stream's lifetime
    * equals the batch session table of everything ingested — the q141
    * identity, continuously. */
  def start(events: DataFrame, stateDir: String, checkpointDir: String,
            gapUs: Long, tsUs: DataFrame => Column,
            userCol: String = "user_id", tieCol: String = "event_id",
            onClosed: (DataFrame, Long) => Unit = (_, _) => (),
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        foldBatch(batch, batchId, stateDir, gapUs, tsUs, userCol, tieCol,
          onClosed)
      }
      .start()
}
