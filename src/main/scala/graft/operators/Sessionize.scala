package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based event sessionization — the classic gaps-and-islands
  * assignment over an event stream: a user's events sort by time, and a
  * silence longer than `gapUs` starts a new session. The reference has no
  * session concept (its stream is per-document change events,
  * monstache.go's gtm.Op loop); this is the event-analytics operator a
  * Spark-native engine is EXPECTED to have, built the Spark-first way —
  * two window functions sharing one per-user sort, never a global sort,
  * never driver-side iteration.
  *
  * Determinism: events order by (ts_us, tieCol) — the tie column (the
  * event id) makes the order total even for equal timestamps, so
  * session numbering is replayable cross-engine; all arithmetic is
  * BIGINT micros.
  *
  * Scale shape: ONE exchange keyed on the user column; `lag` and the
  * running `sum` share that single sort (Catalyst collapses same-spec
  * windows into one Window operator); partitions are user-sized (a
  * user's event history, not the corpus). The stats aggregation is a
  * second, map-side-combined shuffle on (user, session) — strictly
  * smaller rows. A 100× corpus scales the number of users, not the
  * partition invariant. */
object Sessionize {

  /** Per-event session assignment: adds `ts_us`, `new_session` (1 on
    * session-opening events) and `session_seq` (1-based per-user session
    * index). `tsUs` is the BIGINT-micros timestamp expression
    * ([[graft.source.EventLog.tsUsOf]] for the events table). Events
    * with a NULL user or NULL timestamp are excluded — a session of
    * nobody at no time is noise, not data (stated, as ever, rather than
    * ridden on window-over-NULL semantics). */
  def withSessions(events: DataFrame, gapUs: Long, tsUs: Column,
                   userCol: String = "user_id",
                   tieCol: String = "event_id"): DataFrame = {
    require(gapUs > 0, s"gapUs=$gapUs: a non-positive gap makes every " +
      "event its own session")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col("ts_us").asc, col(tieCol).asc)
    events
      .withColumn("ts_us", tsUs.cast("long"))
      .filter(col(userCol).isNotNull && col("ts_us").isNotNull)
      .withColumn("__prev", lag(col("ts_us"), 1).over(w))
      .withColumn("new_session",
        when(col("__prev").isNull || col("ts_us") - col("__prev") > gapUs,
          1L).otherwise(0L))
      .withColumn("session_seq",
        sum(col("new_session")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .drop("__prev")
  }

  /** Per-session rollup: (user, session_seq, n_events, start_us, end_us,
    * dur_us) — the session table an engagement/funnel analysis joins.
    * All-integer outputs (no float accumulation anywhere). */
  def sessionStats(events: DataFrame, gapUs: Long, tsUs: Column,
                   userCol: String = "user_id",
                   tieCol: String = "event_id"): DataFrame =
    withSessions(events, gapUs, tsUs, userCol, tieCol)
      .groupBy(col(userCol), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"))
      .withColumn("dur_us", col("end_us") - col("start_us"))

  /** DuckDB twin: CTE chain `sess_e, sess_l, sess_s` replaying
    * [[withSessions]] over a table/CTE `src` with `epoch_us(ts)` micros
    * — same (ts_us, tie) total order, same gap comparison, same running
    * sum. Aggregate `sess_s` by (user, session_seq) for the stats
    * twin. */
  def sqlSessionCtes(src: String, gapUs: Long,
                     userCol: String = "user_id",
                     tieCol: String = "event_id"): String =
    s"""sess_e AS (
       |  SELECT *, epoch_us(ts) AS ts_us FROM $src
       |  WHERE $userCol IS NOT NULL AND ts IS NOT NULL),
       |sess_l AS (
       |  SELECT *, lag(ts_us) OVER (PARTITION BY $userCol
       |    ORDER BY ts_us, $tieCol) AS __prev
       |  FROM sess_e),
       |sess_s AS (
       |  SELECT *, sum(CASE WHEN __prev IS NULL OR ts_us - __prev > $gapUs
       |                     THEN 1 ELSE 0 END)
       |    OVER (PARTITION BY $userCol ORDER BY ts_us, $tieCol
       |          ROWS UNBOUNDED PRECEDING) AS session_seq
       |  FROM sess_l)""".stripMargin
}
