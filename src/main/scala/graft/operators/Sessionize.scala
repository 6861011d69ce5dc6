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
  * running `sum` share that single sort (Spark stacks the two frames as
  * adjacent Window nodes over one exchange + one sort — PlanAuditSpec
  * pins it); partitions are user-sized (a
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

  /** Empty open-session state with [[sessionStats]]'s schema — the
    * bootstrap artifact for [[sessionStatsIncremental]]. */
  def emptySessionState(spark: org.apache.spark.sql.SparkSession,
                        userCol: String = "user_id"): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      StructType(Seq(
        StructField(userCol, LongType), StructField("session_seq", LongType),
        StructField("n_events", LongType), StructField("start_us", LongType),
        StructField("end_us", LongType), StructField("dur_us", LongType))))
  }

  /** Incremental sessionization — the run-over-run ingest shape: a new
    * TIME-PARTITIONED batch (every event at-or-after the previous
    * batch's last, per user — the log-ingest contract, enforced loudly)
    * is sessionized alone, then stitched to the persisted OPEN-session
    * state: a user's first batch session merges into their open session
    * when the silence between them is within `gapUs`, and every batch
    * session renumbers by the user's standing session count. Returns
    * (closed sessions — final, safe to ship downstream; new open state —
    * one row per user, their possibly-still-growing last session).
    *
    * Identity (pinned by SessionizeSpec and q141's oracle): closed ∪
    * state after folding batches b1…bn equals `sessionStats(b1 ∪ … ∪
    * bn)` exactly — the old corpus is never re-read, only the
    * users-touched slice of the per-user state joins the batch.
    *
    * Scale shape: the batch sessionizes at batch cost; the stitch is
    * one user-keyed join of the batch's per-user FIRST session against
    * the state (state rows are 6 longs per user), a user-keyed max for
    * the last-session split, and an anti-join carrying untouched users
    * forward. Nothing proportional to history length anywhere. */
  def sessionStatsIncremental(newEvents: DataFrame, openState: DataFrame,
                              gapUs: Long, tsUs: Column,
                              userCol: String = "user_id",
                              tieCol: String = "event_id")
      : (DataFrame, DataFrame) = {
    val b = graft.CacheBarriers.barrier(
      sessionStats(newEvents, gapUs, tsUs, userCol, tieCol))
    // openState is consumed three times (open join, closedOld semi-join,
    // carried anti-join) — barrier it or a fold chain embeds earlier
    // folds' plans exponentially (the funnelIncremental lesson)
    val ost = graft.CacheBarriers.barrier(openState)
    val open = ost.select(col(userCol),
      col("session_seq").as("__oseq"), col("n_events").as("__on"),
      col("start_us").as("__ostart"), col("end_us").as("__oend"))
    // one row per user in the batch: their open-session linkage verdict.
    // Row-lazy raise_error keeps the contract check off the happy path.
    val flags = graft.CacheBarriers.barrier(
      b.filter(col("session_seq") === 1)
        .join(open, Seq(userCol), "left")
        .select(col(userCol),
          coalesce(col("__oseq"), lit(0L)).as("__oseq"),
          coalesce(col("__on"), lit(0L)).as("__on"),
          col("__ostart"),
          when(col("__oend").isNull, lit(false))
            .when(col("start_us") < col("__oend"), raise_error(concat(
              lit("sessionStatsIncremental: batch event at "),
              col("start_us").cast("string"),
              lit(" precedes open-session end "),
              col("__oend").cast("string"), lit(" for user "),
              col(userCol).cast("string"),
              lit(" — batches must be time-partitioned per user"))))
            .otherwise(col("start_us") - col("__oend") <= gapUs)
            .as("__merge")))
    // renumber, absorb the merged first session, and mark each user's
    // LAST (still-open) session in the same pass — the per-user max
    // rides a frame-less window on the join's own partitioning instead
    // of a groupBy + two re-joins (one exchange, not three)
    val renumbered = graft.CacheBarriers.barrier(
      b.join(flags, Seq(userCol))
        .withColumn("__newseq", col("session_seq") + col("__oseq") -
          when(col("__merge"), 1L).otherwise(0L))
        .withColumn("__absorb", col("session_seq") === 1 && col("__merge"))
        .select(col(userCol), col("__newseq").as("session_seq"),
          (col("n_events") +
            when(col("__absorb"), col("__on")).otherwise(0L)).as("n_events"),
          when(col("__absorb"), col("__ostart")).otherwise(col("start_us"))
            .as("start_us"),
          col("end_us"))
        .withColumn("dur_us", col("end_us") - col("start_us"))
        .withColumn("__last",
          max(col("session_seq")).over(Window.partitionBy(col(userCol)))))
    val closedNew = renumbered.filter(col("session_seq") < col("__last"))
      .drop("__last")
    // the previous open session ships as closed once its user shows new
    // activity that did NOT continue it; a merged open row is absorbed
    // into the batch's first session instead
    val closedOld = ost.join(
      flags.filter(!col("__merge")).select(col(userCol)),
      Seq(userCol), "left_semi")
    val newOpen = renumbered.filter(col("session_seq") === col("__last"))
      .drop("__last")
    val carried = ost.join(flags.select(col(userCol)),
      Seq(userCol), "left_anti")
    (closedOld.unionByName(closedNew), carried.unionByName(newOpen))
  }

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
