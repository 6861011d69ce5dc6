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
    * ONE user-keyed aggregation over (state rows ∪ batch session rows)
    * — the funnelIncremental shape — with merge/renumber/absorb/split
    * in array algebra on the grouped row, so the state shuffles once,
    * is never required to be broadcast-small, and nothing is
    * proportional to history length anywhere. */
  def sessionStatsIncremental(newEvents: DataFrame, openState: DataFrame,
                              gapUs: Long, tsUs: Column,
                              userCol: String = "user_id",
                              tieCol: String = "event_id")
      : (DataFrame, DataFrame) = {
    // the batch sessionizes at batch cost (window over batch events —
    // unavoidable, the session segmentation itself); the STITCH to the
    // open-session state is then ONE user-keyed aggregation over
    // (state rows ∪ batch session rows) — the funnelIncremental shape:
    // the open session's columns ride max() (one state row per user,
    // batch rows null there), the batch's sessions collect sorted by
    // session_seq, and the merge/renumber/absorb/split logic runs in
    // array algebra on the grouped row. The state shuffles once — no
    // open join, no closed-old semi-join, no carried anti-join — and
    // never needs to be broadcast-small.
    val b = sessionStats(newEvents, gapUs, tsUs, userCol, tieCol)
    val sT = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("session_seq",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("n_events",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("start_us",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("end_us",
        org.apache.spark.sql.types.LongType)))
    val stRows = graft.CacheBarriers.barrier(openState).select(
      col(userCol), col("session_seq").as("__oseq0"),
      col("n_events").as("__on"), col("start_us").as("__ostart"),
      col("end_us").as("__oend"), lit(null).cast(sT).as("__bs"))
    val bRows = b.select(col(userCol),
      lit(null).cast("long").as("__oseq0"),
      lit(null).cast("long").as("__on"),
      lit(null).cast("long").as("__ostart"),
      lit(null).cast("long").as("__oend"),
      struct(col("session_seq"), col("n_events"), col("start_us"),
        col("end_us")).as("__bs"))
    // merge verdict per user: the batch's first session continues the
    // open session when the silence is within gapUs; a batch that
    // STARTS BEFORE the open session's end violates the log-ingest
    // contract (row-lazy raise riding the verdict, which every output
    // path consumes)
    val agg = graft.CacheBarriers.barrier(
      stRows.unionByName(bRows)
        .groupBy(col(userCol))
        .agg(max(col("__oseq0")).as("__oseq0"), max(col("__on")).as("__on"),
          max(col("__ostart")).as("__ostart"),
          max(col("__oend")).as("__oend"),
          array_sort(collect_list(col("__bs"))).as("__bss"))
        .withColumn("__b1", expr("try_element_at(__bss, 1)"))
        .withColumn("__merge",
          when(size(col("__bss")) === 0 || col("__oend").isNull,
            lit(false))
            .when(col("__b1.start_us") < col("__oend"), raise_error(concat(
              lit("sessionStatsIncremental: batch event at "),
              col("__b1.start_us").cast("string"),
              lit(" precedes open-session end "),
              col("__oend").cast("string"), lit(" for user "),
              col(userCol).cast("string"),
              lit(" — batches must be time-partitioned per user"))))
            .otherwise(col("__b1.start_us") - col("__oend") <= lit(gapUs)))
        .withColumn("__oseq", coalesce(col("__oseq0"), lit(0L)))
        // renumber by the standing count and absorb the merged first
        // batch session into the open one
        .withColumn("__rs", expr(
          """transform(__bss, x -> struct(
            |  x.session_seq + __oseq - IF(__merge, 1L, 0L) AS session_seq,
            |  x.n_events + IF(__merge AND x.session_seq = 1L, __on, 0L)
            |    AS n_events,
            |  IF(__merge AND x.session_seq = 1L, __ostart, x.start_us)
            |    AS start_us,
            |  x.end_us AS end_us))""".stripMargin)))
    // closed = the previous open session when new activity did NOT
    // continue it, plus every renumbered batch session except the last
    // (the user's possibly-still-growing one)
    val closed = agg
      .withColumn("__c", explode(expr(
        """concat(
          |  CASE WHEN __oend IS NOT NULL AND size(__bss) > 0
          |            AND NOT __merge
          |    THEN array(struct(__oseq0 AS session_seq, __on AS n_events,
          |                      __ostart AS start_us, __oend AS end_us))
          |    ELSE array() END,
          |  slice(__rs, 1, greatest(size(__rs) - 1, 0)))""".stripMargin)))
      .select(col(userCol), col("__c.session_seq"), col("__c.n_events"),
        col("__c.start_us"), col("__c.end_us"),
        (col("__c.end_us") - col("__c.start_us")).as("dur_us"))
    // new open = the last renumbered batch session, or the carried open
    // row for a user the batch never touched
    val newOpen = agg
      .withColumn("__o", expr(
        """CASE WHEN size(__rs) > 0 THEN element_at(__rs, -1)
          |ELSE struct(__oseq0 AS session_seq, __on AS n_events,
          |            __ostart AS start_us, __oend AS end_us) END"""
          .stripMargin))
      .select(col(userCol), col("__o.session_seq"), col("__o.n_events"),
        col("__o.start_us"), col("__o.end_us"),
        (col("__o.end_us") - col("__o.start_us")).as("dur_us"))
    (closed, newOpen)
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
