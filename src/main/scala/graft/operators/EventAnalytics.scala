package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-funnel and retention-cohort analytics over an event stream —
  * the two standard engagement reports beside [[Sessionize]], built the
  * Spark-first way: per-step user sets are chained user-keyed
  * aggregations (each co-partitioned with the last), cohorts are two
  * integer-day aggregations, and nothing driver-side ever sees a row.
  * All outputs are exact BIGINT micros/counts — no floats anywhere. */
object EventAnalytics {

  /** Ordered conversion funnel: a user reaches step i when an event of
    * `steps(i)` occurs AT OR AFTER their earliest completion time of
    * step i−1 (the classic min-time chain; re-orderings within a
    * timestamp tie count — `>=` — matching the standard funnel
    * convention). Returns one row per step: (step_idx, step, n_users,
    * conv_total_micro — share of step-0 users, conv_step_micro — share
    * of the previous step's users).
    *
    * Scale shape: step i is a type-pruned scan (the filter pushes to the
    * source) feeding a user-keyed min aggregation joined against step
    * i−1's user table — every join and agg keys on the user column, so
    * the chain re-uses one co-partitioning; per-step frames are
    * one-row-per-user. The report assembly windows over a
    * steps-count-sized frame (config, not data — the one global window
    * here is over ≤ |steps| rows). */
  def funnel(events: DataFrame, steps: Seq[String], tsUs: Column,
             userCol: String = "user_id",
             typeCol: String = "event_type",
             withinUs: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel: no steps")
    require(steps.distinct.length == steps.length,
      s"funnel: duplicate steps in ${steps.mkString(",")} — a repeated " +
        "step name makes the chain ambiguous")
    require(withinUs.forall(_ > 0),
      s"funnel: withinUs=$withinUs must be positive — a zero window " +
        "admits only timestamp ties")
    val base = graft.CacheBarriers.barrier(events
      .withColumn("ts_us", tsUs.cast("long"))
      .filter(col(userCol).isNotNull && col("ts_us").isNotNull)
      .select(col(userCol).as("__u"), col(typeCol).as("__ty"),
        col("ts_us")))
    val stepFrames = steps.zipWithIndex.scanLeft(
      Option.empty[DataFrame]) { case (prev, (step, _)) =>
      val evs = base.filter(col("__ty") === step)
      val reached = prev match {
        case None => evs.groupBy(col("__u")).agg(min(col("ts_us")).as("t"))
        case Some(p) =>
          // optional conversion window: step i must land within
          // `withinUs` of the previous step's completion, the
          // bounded-window funnel variant every product dashboard offers
          val inWindow = withinUs match {
            case None => col("ts_us") >= col("__pt")
            case Some(wUs) => col("ts_us") >= col("__pt") &&
              col("ts_us") <= col("__pt") + wUs
          }
          evs.join(p.select(col("__u"), col("t").as("__pt")), Seq("__u"))
            .filter(inWindow)
            .groupBy(col("__u")).agg(min(col("ts_us")).as("t"))
      }
      Some(graft.CacheBarriers.barrier(reached))
    }.flatten
    val rows = steps.zip(stepFrames).zipWithIndex.map {
      case ((step, frame), i) =>
        frame.agg(count(lit(1)).as("n_users"))
          .withColumn("step_idx", lit(i.toLong))
          .withColumn("step", lit(step))
    }.reduce(_ unionByName _)
    // |steps| rows total: the unpartitioned window is config-sized by
    // construction, not a data-sized global sort
    val w = Window.orderBy(col("step_idx"))
    rows
      .withColumn("__n0", first(col("n_users")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__np",
        coalesce(lag(col("n_users"), 1).over(w), col("n_users")))
      .withColumn("conv_total_micro",
        expr("n_users * 1000000L DIV greatest(__n0, 1L)"))
      .withColumn("conv_step_micro",
        expr("n_users * 1000000L DIV greatest(__np, 1L)"))
      .select(col("step_idx"), col("step"), col("n_users"),
        col("conv_total_micro"), col("conv_step_micro"))
  }

  /** Retention cohort table: users cohort by their FIRST active UTC day
    * (`ts_us DIV 86400000000`), and each later active day counts them at
    * `offset_days = day − cohort_day`. Returns (cohort_day, offset_days,
    * n_users) — the standard triangle a retention dashboard pivots;
    * offset 0 row carries the cohort's size.
    *
    * Scale shape: distinct (user, day) first — one user-keyed exchange
    * whose map-side distinct collapses each user's events per day — then
    * the per-user min rides a window on the SAME partitioning (no second
    * exchange), and the (cohort, offset) count is a map-side-combined
    * aggregation over day-pair-cardinality groups. */
  def retentionCohorts(events: DataFrame, tsUs: Column,
                       userCol: String = "user_id"): DataFrame = {
    val days = events
      .withColumn("ts_us", tsUs.cast("long"))
      .filter(col(userCol).isNotNull && col("ts_us").isNotNull)
      .select(col(userCol).as("__u"),
        expr("ts_us DIV 86400000000L").as("day"))
      .distinct()
    val w = Window.partitionBy(col("__u"))
    days
      .withColumn("cohort_day", min(col("day")).over(w))
      .groupBy(col("cohort_day"),
        (col("day") - col("cohort_day")).as("offset_days"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** First-order transition matrix of the event stream: for every
    * consecutive event pair within a user's (ts, tie)-ordered history,
    * count (from_type → to_type) and each cell's share of its from-row —
    * the empirical Markov kernel behind "what do users do after X".
    * Returns (from_type, to_type, n, share_micro); NULL user/ts/type
    * events are excluded by statement.
    *
    * Scale shape: the [[Sessionize]] argument — one per-user window
    * (lag rides a single user-keyed sort), then a map-side-combined
    * count over type-pair-cardinality groups and a config-sized row
    * total join. */
  def transitionMatrix(events: DataFrame, tsUs: Column,
                       userCol: String = "user_id",
                       typeCol: String = "event_type",
                       tieCol: String = "event_id"): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val w = Window.partitionBy(col(userCol))
      .orderBy(col("ts_us").asc, col(tieCol).asc)
    val pairs = events
      .withColumn("ts_us", tsUs.cast("long"))
      .filter(col(userCol).isNotNull && col("ts_us").isNotNull &&
        col(typeCol).isNotNull)
      .withColumn("__from", lag(col(typeCol), 1).over(w))
      .filter(col("__from").isNotNull)
    val counts = pairs
      .groupBy(col("__from").as("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("from_type"))
      .agg(sum(col("n")).as("__t"))
    counts.join(broadcast(totals), Seq("from_type"))
      .withColumn("share_micro", expr("n * 1000000L DIV greatest(__t, 1L)"))
      .select(col("from_type"), col("to_type"), col("n"),
        col("share_micro"))
  }

  /** Incremental transition matrix — the run-over-run ingest shape for
    * [[transitionMatrix]]: per-batch transition COUNTS are additive once
    * the boundary-crossing pair (a user's last event of the previous
    * batch → first event of this one) is stitched through a per-user
    * last-event state, exactly [[Sessionize.sessionStatsIncremental]]'s
    * contract one notch simpler (state is 4 columns, the stitch is one
    * join). Batches must be time-partitioned per user in the SAME
    * (ts, tie) lexicographic order the full window sorts by — a batch
    * event at the persisted ts whose tie orders it AT OR BEFORE the
    * persisted event raises exactly like an earlier ts does (the state
    * persists last_tie for this; a later tie at the same ts is a legal
    * tie-split and pairs normally). Equality raises too: an exactly
    * duplicated (ts, tie) across batches would make the full window's
    * order of the duplicates nondeterministic, so the incremental/full
    * identity could not be guaranteed for it — (ts, tie) must be unique
    * per user, which `event_id` ties give by construction.
    * Returns (this batch's transition-count DELTA — fold into the
    * running census by addition; new last-event state). Identity: deltas
    * summed over b1…bn equal the full-union counts exactly, so q155's
    * oracle is q151's restricted to nothing. */
  def transitionMatrixIncremental(newEvents: DataFrame, lastState: DataFrame,
                                  tsUs: Column,
                                  userCol: String = "user_id",
                                  typeCol: String = "event_type",
                                  tieCol: String = "event_id")
      : (DataFrame, DataFrame) = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col("ts_us").asc, col("__tie").asc)
    val base = graft.CacheBarriers.barrier(newEvents
      .withColumn("ts_us", tsUs.cast("long"))
      .filter(col(userCol).isNotNull && col("ts_us").isNotNull &&
        col(typeCol).isNotNull)
      .select(col(userCol), col(typeCol).as("__ty"), col("ts_us"),
        col(tieCol).as("__tie"))
      .withColumn("__from", lag(col("__ty"), 1).over(w))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__last",
        max(col("__rn")).over(Window.partitionBy(col(userCol)))))
    val open = lastState.select(col(userCol),
      col("last_type").as("__lt"), col("last_ts").as("__lts"),
      col("last_tie").as("__ltie"))
    // boundary stitch: the user's FIRST batch event pairs with the
    // persisted last event — with the time-partitioning contract checked
    // in the full window's own (ts, tie) lexicographic order, so a
    // boundary ts-tie whose tie would order the batch event FIRST raises
    // instead of silently producing pairs the full-corpus window wouldn't
    val firsts = base.filter(col("__rn") === 1)
      .join(open, Seq(userCol), "left")
      .withColumn("__from2",
        when(col("__lts").isNotNull &&
            (col("ts_us") < col("__lts") ||
              (col("ts_us") === col("__lts") &&
                col("__tie") <= col("__ltie"))),
          raise_error(concat(
            lit("transitionMatrixIncremental: batch event at ("),
            col("ts_us").cast("string"), lit(","),
            col("__tie").cast("string"),
            lit(") does not strictly follow persisted last ("),
            col("__lts").cast("string"), lit(","),
            col("__ltie").cast("string"), lit(") for user "),
            col(userCol).cast("string"),
            lit(" — batches must be time-partitioned per user"))))
          .otherwise(col("__lt")))
      .select(col(userCol), col("__ty"), col("__from2").as("__from"))
    val inner = base.filter(col("__rn") > 1)
      .select(col(userCol), col("__ty"), col("__from"))
    val delta = inner.unionByName(firsts)
      .filter(col("__from").isNotNull)
      .groupBy(col("__from").as("from_type"), col("__ty").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val newOpen = base.filter(col("__rn") === col("__last"))
      .select(col(userCol), col("__ty").as("last_type"),
        col("ts_us").as("last_ts"), col("__tie").as("last_tie"))
    val carried = lastState.join(
      base.select(col(userCol)).distinct(), Seq(userCol), "left_anti")
    (delta, carried.unionByName(newOpen))
  }

  /** Fold a transition delta into the running census — pure addition. */
  def mergeTransitionCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("from_type"), col("to_type"))
      .agg(sum(col("n")).as("n"))

  /** Empty last-event state for [[transitionMatrixIncremental]].
    * `tieType` must match the tie column's runtime type (event_id here
    * defaults long) — the boundary-order check compares them directly. */
  def emptyTransitionState(spark: org.apache.spark.sql.SparkSession,
                           userCol: String = "user_id",
                           tieType: org.apache.spark.sql.types.DataType =
                             org.apache.spark.sql.types.LongType)
      : DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField(userCol, LongType),
        StructField("last_type", StringType),
        StructField("last_ts", LongType),
        StructField("last_tie", tieType))))
  }

  /** Daily/rolling active users: for every UTC day with activity, the
    * distinct-user count that day (DAU) and over the trailing
    * `windowDays` window (WAU), plus the stickiness ratio DAU/WAU — the
    * engagement headline next to [[retentionCohorts]]. Exact distinct
    * counts, not sketches.
    *
    * Scale shape: a sliding COUNT DISTINCT has no single-pass window
    * form, so each (user, day) activity row fans out to the `windowDays`
    * window-END days it supports — a bounded ×windowDays explode of the
    * already-day-deduped table (far smaller than events) — and each end
    * day counts its distinct supporters map-side. Two user-keyed
    * distincts + one day-keyed count; nothing corpus-sized. */
  def activeUsers(events: DataFrame, tsUs: Column, windowDays: Int = 7,
                  userCol: String = "user_id"): DataFrame = {
    require(windowDays >= 1, s"activeUsers: windowDays=$windowDays")
    import org.apache.spark.sql.functions.broadcast
    val days = graft.CacheBarriers.barrier(events
      .withColumn("ts_us", tsUs.cast("long"))
      .filter(col(userCol).isNotNull && col("ts_us").isNotNull)
      .select(col(userCol).as("__u"),
        expr("ts_us DIV 86400000000L").as("day"))
      .distinct())
    val dau = days.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val wau = days
      .select(col("__u"),
        explode(sequence(col("day"), col("day") + (windowDays - 1)))
          .as("day"))
      .distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("wau"))
    dau.join(broadcast(wau), Seq("day"))
      .withColumn("stickiness_micro",
        expr("dau * 1000000L DIV greatest(wau, 1L)"))
      .select(col("day"), col("dau"), col("wau"), col("stickiness_micro"))
  }

  /** Incremental [[activeUsers]] — the run-over-run ingest shape for the
    * DAU/WAU report, completing the event family's incremental set
    * (sessions, transitions, and now active users). The state is the
    * distinct (user, day) activity table — the minimal sufficient
    * statistic for a sliding COUNT DISTINCT (per-day counts cannot merge
    * across batches without losing distinctness) — and it folds by SET
    * UNION, so unlike the transition state it is ORDER-FREE: batches
    * need no time-partitioning contract, late events just add pairs.
    *
    * Returns (report delta, new state): the delta re-derives the
    * (day, dau, wau, stickiness) rows for every day the batch's NOVEL
    * pairs can influence — the pair's own day for DAU, the `windowDays`
    * window-end days it supports for WAU — restricted to days that have
    * activity in the folded state (the report's own row condition).
    * Fold: day-keyed upsert ([[mergeActiveReport]], delta wins).
    * Identity: folding batches b1…bn gives [[activeUsers]] of the full
    * union exactly, in any batch order — q158's oracle is q156's.
    *
    * Scale shape: the batch distinct is batch-sized; the novelty check
    * is one user-keyed anti-join against the state; affected days are a
    * bounded ×windowDays explode of the NOVEL pairs (tiny), and the
    * recompute is [[activeUsers]]'s own two aggregations over the state
    * semi-join-pruned to affected days BEFORE the distinct. The state is
    * user×day cardinality — the bucketed layout
    * ([[graft.streaming.StreamingActiveUsers]]) keeps its rewrite
    * touched-buckets-only, like the session state's. */
  def activeUsersIncremental(newEvents: DataFrame, state: DataFrame,
                             tsUs: Column, windowDays: Int = 7,
                             userCol: String = "user_id")
      : (DataFrame, DataFrame) = {
    require(windowDays >= 1, s"activeUsersIncremental: $windowDays")
    val (delta, fresh) = activeUsersDeltaFrom(
      activityPairs(newEvents, tsUs, userCol), state, windowDays)
    (delta, graft.CacheBarriers.barrier(state.unionByName(fresh)))
  }

  /** The batch's distinct (user, day) activity pairs — [[activeUsers]]'s
    * own first step, shared by the incremental and bucketed folds. */
  private[graft] def activityPairs(events: DataFrame, tsUs: Column,
                                   userCol: String = "user_id")
      : DataFrame =
    events
      .withColumn("ts_us", tsUs.cast("long"))
      .filter(col(userCol).isNotNull && col("ts_us").isNotNull)
      .select(col(userCol).as("__u"),
        expr("ts_us DIV 86400000000L").as("day"))
      .distinct()

  /** The delta core over a state SLICE: `stateSlice` must contain every
    * persisted pair whose day lies within `windowDays − 1` of any batch
    * day (the full state trivially qualifies; the bucketed fold passes
    * the day-range-pruned union — WAU at day d reads only (d−w, d], so
    * the slice premise bounds exactly what the recompute can touch).
    * Returns (report delta for every affected day, the batch's NOVEL
    * pairs). */
  private[graft] def activeUsersDeltaFrom(batchPairs: DataFrame,
                                          stateSlice: DataFrame,
                                          windowDays: Int)
      : (DataFrame, DataFrame) = {
    val fresh = graft.CacheBarriers.barrier(
      batchPairs.join(stateSlice, Seq("__u", "day"), "left_anti"))
    val folded = graft.CacheBarriers.barrier(
      stateSlice.unionByName(fresh))
    // a novel pair at day D changes DAU(D) and WAU(D … D+w−1); report
    // rows exist only for days with activity, so intersect with the
    // folded day set
    val affected = fresh
      .select(explode(sequence(col("day"),
        col("day") + (windowDays - 1))).as("day"))
      .distinct()
      .join(folded.select(col("day")).distinct(), Seq("day"),
        "left_semi")
    val dau = folded.join(affected, Seq("day"), "left_semi")
      .groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val wau = folded
      .select(col("__u"),
        explode(sequence(col("day"), col("day") + (windowDays - 1)))
          .as("day"))
      .join(affected, Seq("day"), "left_semi")
      .distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("wau"))
    val delta = dau.join(broadcast(wau), Seq("day"))
      .withColumn("stickiness_micro",
        expr("dau * 1000000L DIV greatest(wau, 1L)"))
      .select(col("day"), col("dau"), col("wau"),
        col("stickiness_micro"))
    (delta, fresh)
  }

  /** Fold an [[activeUsersIncremental]] report delta into the running
    * report — day-keyed upsert, the delta's recomputed rows win. */
  def mergeActiveReport(report: DataFrame, delta: DataFrame): DataFrame =
    report.join(delta.select(col("day")), Seq("day"), "left_anti")
      .unionByName(delta)

  /** Empty (user, day) activity state for [[activeUsersIncremental]]. */
  def emptyActiveState(spark: org.apache.spark.sql.SparkSession)
      : DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("__u", LongType),
        StructField("day", LongType))))
  }

  /** DuckDB twin of [[funnel]]'s per-step reached CTEs: `fstep_0 …
    * fstep_{n-1}`, each (user, t). Chain them into the report with
    * scalar `count(*)` subqueries. */
  def sqlFunnelCtes(src: String, steps: Seq[String],
                    userCol: String = "user_id",
                    typeCol: String = "event_type",
                    withinUs: Option[Long] = None): String = {
    val base = s"""fbase AS (
       |  SELECT $userCol AS u, $typeCol AS ty, epoch_us(ts) AS ts_us
       |  FROM $src WHERE $userCol IS NOT NULL AND ts IS NOT NULL)"""
      .stripMargin
    val windowSql = withinUs.map(w => s" AND e.ts_us <= p.t + $w")
      .getOrElse("")
    val chain = steps.zipWithIndex.map { case (step, i) =>
      if (i == 0)
        s"""fstep_0 AS (
           |  SELECT u, min(ts_us) AS t FROM fbase WHERE ty = '$step'
           |  GROUP BY u)""".stripMargin
      else
        s"""fstep_$i AS (
           |  SELECT e.u, min(e.ts_us) AS t
           |  FROM fbase e JOIN fstep_${i - 1} p ON e.u = p.u
           |  WHERE e.ty = '$step' AND e.ts_us >= p.t$windowSql
           |  GROUP BY e.u)""".stripMargin
    }
    (base +: chain).mkString(",\n")
  }
}
