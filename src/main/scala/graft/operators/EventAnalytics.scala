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

  /** Incremental [[funnel]] — per-user step-completion state folded one
    * batch at a time. The state row is (user, m_0 … m_{k−1}, last_ts):
    * m_i is the user's earliest completion time of step i under the
    * chain-and-window rules, and the fold is exact because each m_i can
    * only transition null → set, never move: batches must be
    * time-partitioned per user with STRICTLY increasing ts (stricter
    * than the transition fold's (ts, tie) order — the funnel's
    * at-or-after `>=` convention makes an equal-ts event from an
    * EARLIER batch retroactively eligible the moment a later batch sets
    * m_{i−1} to that ts, which no per-user state can repair; the
    * row-lazy raise_error enforces strictness). Within a batch the
    * k-step chain advances in ONE per-user walk over the user's
    * collected (step, ts) events — the justified per-row-walk class
    * (sessionize/BPE argument): the chain is sequential by definition,
    * and expressing it as k dependent joins nests each step's frame
    * twice into the next, a 2^k analyzed-plan blowup per fold. Returns
    * the new state; [[funnelReportFromState]] derives the q142-shape
    * report, and folding b1…bn then reporting equals the full-log
    * funnel exactly — q163's oracle is q142's verbatim.
    *
    * Scale shape: ONE user-keyed aggregation over (state ∪ batch
    * events) — the state's m-vector rides max() (event rows are null
    * there), the batch's STEP-TYPED events ride a null-skipping
    * collect_list (state rows are null there) — so each fold is one
    * shuffle with map-side combine, no join, no sort, and never
    * depends on the state being broadcast-small. Nothing windows over
    * data; per-user memory is the user's batch events, the sessionize
    * bound. */
  def funnelIncremental(newEvents: DataFrame, state: DataFrame,
                        steps: Seq[String], tsUs: Column,
                        withinUs: Option[Long] = None,
                        userCol: String = "user_id",
                        typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty && steps.distinct.length == steps.length,
      s"funnelIncremental: bad steps ${steps.mkString(",")}")
    require(withinUs.forall(_ > 0), s"funnelIncremental: withinUs")
    val k = steps.length
    val stepIdx = steps.zipWithIndex.toMap
    val win = withinUs
    // the per-user chain walk: given the batch's (step, ts) events and
    // the persisted m-vector (UNSET sentinel for null — ts are epoch
    // micros, never MinValue), advance each unset m_i to the earliest
    // qualifying batch event. min-over-array per step, so collect_list
    // order never matters. A per-row walk, not k chained joins: the
    // step chain is sequential by definition, and expressing it as k
    // dependent joins nests the plan 2^k per fold (each step reads the
    // previous step's frame twice) — the analyzed plan exploded the
    // driver at 3 folds × 4 steps before this shape.
    val UNSET = Long.MinValue
    val chainU = udf { (tys: Seq[String], tss: Seq[Long], ms0: Seq[Long]) =>
      val ms = ms0.toArray
      var i = 0
      while (i < ms.length) {
        if (ms(i) == UNSET) {
          val lo = if (i == 0) Long.MinValue + 1 else ms(i - 1)
          if (i == 0 || lo != UNSET) {
            val hi = if (i == 0) Long.MaxValue
              else win.map(w => lo + w).getOrElse(Long.MaxValue)
            var best = UNSET
            var j = 0
            while (j < tys.length) {
              if (stepIdx(tys(j)) == i && tss(j) >= (if (i == 0) Long.MinValue else lo) &&
                  tss(j) <= hi && (best == UNSET || tss(j) < best))
                best = tss(j)
              j += 1
            }
            ms(i) = best
          }
        }
        i += 1
      }
      ms.toSeq
    }
    val evs = graft.CacheBarriers.barrier(newEvents
      .withColumn("ts_us", tsUs.cast("long"))
      .filter(col(userCol).isNotNull && col("ts_us").isNotNull &&
        col(typeCol).isin(steps: _*))
      .select(col(userCol).as("__u"), col(typeCol).as("__ty"),
        col("ts_us")))
    // barriered so a chain of n folds persists each state once instead
    // of re-deriving the whole history per fold (plan-depth hygiene —
    // the q188 nine-fold chain paid ~5× wall before this)
    val st = graft.CacheBarriers.barrier(state)
    // ONE user-keyed aggregation over (state rows ∪ batch events)
    // replaces the round-12 update join + carried anti-join + union:
    // the state contributes at most one row per user (its m-vector and
    // last_ts surface through max() — event rows are null there), the
    // batch contributes its (step, ts) events (collected as structs —
    // state rows are null there and collect_list skips nulls), and one
    // select either advances the chain (batch-present: __minTs set) or
    // carries the state columns through untouched. One shuffle per
    // fold, no join, no sort — and unlike a join it never depends on
    // the state being broadcast-small, so the shape survives a
    // 100M-user state unchanged.
    val nullL = lit(null).cast("long")
    val stRows = st.select(Seq(col("__u"), col("last_ts")) ++
      (0 until k).map(i => col(s"m_$i")) ++
      Seq(lit(null).cast("string").as("__ty"), nullL.as("ts_us")): _*)
    val evRows = evs.select(Seq(col("__u"), nullL.as("last_ts")) ++
      (0 until k).map(i => nullL.as(s"m_$i")) ++
      Seq(col("__ty"), col("ts_us")): _*)
    // strictly-later contract checked row-lazily against the persisted
    // last_ts; __ck is 0 on every legal row (and raises otherwise), so
    // adding it keeps the check in the live plan and leaves last_ts at
    // the batch max
    stRows.unionByName(evRows)
      .groupBy(col("__u"))
      .agg(max(col("last_ts")).as("__prevLast"),
        (0 until k).map(i => max(col(s"m_$i")).as(s"__pm_$i")) ++ Seq(
          min(col("ts_us")).as("__minTs"), max(col("ts_us")).as("__maxTs"),
          collect_list(when(col("__ty").isNotNull,
            struct(col("__ty").as("t"), col("ts_us").as("s"))))
            .as("__evl")): _*)
      .withColumn("__ck",
        when(col("__prevLast").isNotNull &&
            col("__minTs") <= col("__prevLast"),
          raise_error(concat(
            lit("funnelIncremental: batch event at ts "),
            col("__minTs").cast("string"),
            lit(" does not strictly follow persisted last_ts "),
            col("__prevLast").cast("string"), lit(" for user "),
            col("__u").cast("string"),
            lit(" — batches must be time-partitioned per user with " +
              "strictly increasing ts"))))
          .otherwise(lit(0L)))
      .withColumn("__ms", when(col("__minTs").isNotNull,
        chainU(expr("transform(__evl, x -> x.t)"),
          expr("transform(__evl, x -> x.s)"),
          array((0 until k).map(i =>
            coalesce(col(s"__pm_$i"), lit(UNSET))): _*))))
      .select(Seq(col("__u"),
        when(col("__minTs").isNull, col("__prevLast"))
          .otherwise(col("__maxTs") + col("__ck")).as("last_ts")) ++
        (0 until k).map(i =>
          when(col("__minTs").isNull, col(s"__pm_$i"))
            .otherwise(when(col("__ms")(i) =!= UNSET, col("__ms")(i)))
            .as(s"m_$i")): _*)
  }

  /** The q142-shape report off a [[funnelIncremental]] state: per step,
    * the count of users whose m_i is set, with the same total/step
    * conversion shares (the one window is over the ≤|steps|-row report
    * frame). */
  def funnelReportFromState(state: DataFrame,
                            steps: Seq[String]): DataFrame = {
    val rows = steps.zipWithIndex.map { case (step, i) =>
      state.agg(count(col(s"m_$i")).as("n_users"))
        .withColumn("step_idx", lit(i.toLong))
        .withColumn("step", lit(step))
    }.reduce(_ unionByName _)
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

  /** Empty per-user funnel state for [[funnelIncremental]]. `userType`
    * admits composite keys — q188 folds every latency pair in one pass
    * per batch by keying the state on a (user, pair) struct, which is
    * still "a user" to the fold (the walk, the strictness raise, and
    * the null→set exactness argument never look inside the key). */
  def emptyFunnelState(spark: org.apache.spark.sql.SparkSession,
                       nSteps: Int,
                       userType: org.apache.spark.sql.types.DataType =
                         org.apache.spark.sql.types.LongType): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      StructType(StructField("__u", userType) +:
        StructField("last_ts", LongType) +:
        (0 until nSteps).map(i => StructField(s"m_$i", LongType))))
  }

  /** Incremental [[retentionCohorts]] — the last event report to gain
    * its run-over-run form (sessions q141, transitions q155, DAU/WAU
    * q158). The state is the same distinct (user, day) table as the
    * DAU/WAU fold (order-free set union, no time-partitioning
    * contract); the report is an ADDITIVE (cohort_day, offset_days)
    * cell census, and the delta is SIGNED: a batch pair at a day
    * EARLIER than a user's current first day moves their cohort
    * retroactively, so the delta retracts every cell the user's old
    * cohort contributed (−1 each) and emits their full new-cohort row
    * set (+1 each); an unmoved user just adds cells for their novel
    * days. Fold: [[mergeRetentionCells]] — pure addition, zero cells
    * dropped. Identity: folded cells over b1…bn equal the full-union
    * triangle in any batch order — q162's oracle is q143's verbatim.
    *
    * Scale shape: novelty is one user-day anti-join; everything else
    * keys on the BATCH's affected users (semi-join-pruned state slice,
    * per-user mins as map-side-combined aggs, cells as
    * day-pair-cardinality counts). Nothing touches users outside the
    * batch — which is why the streaming form buckets this state by
    * USER where the DAU/WAU form buckets by day: retention reads are
    * per-user history, not day windows. */
  def retentionCohortsIncremental(newEvents: DataFrame, state: DataFrame,
                                  tsUs: Column,
                                  userCol: String = "user_id")
      : (DataFrame, DataFrame) = {
    val batchPairs = activityPairs(newEvents, tsUs, userCol)
    val (delta, fresh) = retentionDeltaFrom(batchPairs, state)
    (delta, graft.CacheBarriers.barrier(state.unionByName(fresh)))
  }

  /** The signed-delta core over a state SLICE: `stateSlice` must hold
    * the FULL (user, day) history of every user in `batchPairs` (the
    * full state qualifies; the bucketed fold passes the union of the
    * batch users' buckets). Returns (signed cell delta, novel pairs). */
  private[graft] def retentionDeltaFrom(batchPairs: DataFrame,
                                        stateSlice: DataFrame)
      : (DataFrame, DataFrame) = {
    val fresh = graft.CacheBarriers.barrier(
      batchPairs.join(stateSlice, Seq("__u", "day"), "left_anti"))
    val users = fresh.select(col("__u")).distinct()
    // the affected users' persisted history and old/new cohort days
    val oldSlice = graft.CacheBarriers.barrier(
      stateSlice.join(users, Seq("__u"), "left_semi"))
    val oldMin = oldSlice.groupBy(col("__u"))
      .agg(min(col("day")).as("m_old"))
    val newMin = graft.CacheBarriers.barrier(
      oldSlice.unionByName(fresh).groupBy(col("__u"))
        .agg(min(col("day")).as("m_new"))
        .join(oldMin, Seq("__u"), "left"))
    val moved = newMin.filter(col("m_old").isNotNull &&
      col("m_new") < col("m_old"))
    // moved users: retract every old-cohort cell, re-emit the full
    // new-cohort row set; unmoved users: just their novel days
    val retract = oldSlice
      .join(moved.select(col("__u"), col("m_old")), Seq("__u"))
      .select(col("m_old").as("cohort_day"),
        (col("day") - col("m_old")).as("offset_days"), lit(-1L).as("__d"))
    val reemit = oldSlice.unionByName(fresh)
      .join(moved.select(col("__u"), col("m_new")), Seq("__u"))
      .select(col("m_new").as("cohort_day"),
        (col("day") - col("m_new")).as("offset_days"), lit(1L).as("__d"))
    val unmovedAdd = fresh
      .join(newMin.filter(col("m_old").isNull ||
          col("m_new") === col("m_old"))
        .select(col("__u"), col("m_new")), Seq("__u"))
      .select(col("m_new").as("cohort_day"),
        (col("day") - col("m_new")).as("offset_days"), lit(1L).as("__d"))
    val delta = retract.unionByName(reemit).unionByName(unmovedAdd)
      .groupBy(col("cohort_day"), col("offset_days"))
      .agg(sum(col("__d")).as("n_users"))
      .filter(col("n_users") =!= 0L)
    (delta, fresh)
  }

  /** Fold a signed retention delta into the running triangle — pure
    * addition on the cell, zero cells dropped (a fully retracted cell
    * must vanish, as it does in the one-shot triangle). */
  def mergeRetentionCells(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("cohort_day"), col("offset_days"))
      .agg(sum(col("n_users")).as("n_users"))
      .filter(col("n_users") =!= 0L)

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
    * last-event state — one user-keyed aggregation over (state ∪ batch
    * events), the [[funnelIncremental]] shape: the per-user order comes
    * from array_sort on the (ts, tie, type) struct instead of a
    * whole-batch window, the state shuffles once (no update join, no
    * carried anti-join), and nothing depends on the state being
    * broadcast-small. Batches must be time-partitioned per user in the SAME
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
    val evs = newEvents
      .withColumn("ts_us", tsUs.cast("long"))
      .filter(col(userCol).isNotNull && col("ts_us").isNotNull &&
        col(typeCol).isNotNull)
      .select(col(userCol), col(typeCol).as("__ty"), col("ts_us"),
        col(tieCol).as("__tie"))
    val tieT = evs.schema("__tie").dataType
    // ONE user-keyed aggregation over (state ∪ batch events) — the
    // funnelIncremental shape: the state row's columns ride max() (at
    // most one per user, event rows null there), the batch's events
    // ride a null-skipping collect_list and sort per user via
    // array_sort on the (ts, tie, type) struct — the full window's own
    // lexicographic order, computed without a window (no whole-batch
    // sort, no update join, no carried anti-join; the state shuffles
    // once and never needs to be broadcast-small).
    val stRows = graft.CacheBarriers.barrier(lastState).select(
      col(userCol), col("last_type"), col("last_ts"), col("last_tie"),
      lit(null).cast(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("ts_us",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("__tie", tieT),
        org.apache.spark.sql.types.StructField("__ty",
          org.apache.spark.sql.types.StringType)))).as("__ev"))
    val evRows = evs.select(col(userCol),
      lit(null).cast("string").as("last_type"),
      lit(null).cast("long").as("last_ts"),
      lit(null).cast(tieT).as("last_tie"),
      struct(col("ts_us"), col("__tie"), col("__ty")).as("__ev"))
    // boundary stitch: the user's FIRST batch event pairs with the
    // persisted last event — with the time-partitioning contract
    // checked in the full window's (ts, tie) lexicographic order, so a
    // boundary ts-tie at or before the persisted event raises (row-lazy,
    // riding the boundary pair's from-type) instead of silently
    // producing pairs the full-corpus window wouldn't
    val agg = graft.CacheBarriers.barrier(
      stRows.unionByName(evRows)
        .groupBy(col(userCol))
        .agg(max(col("last_type")).as("__lt"),
          max(col("last_ts")).as("__lts"),
          max(col("last_tie")).as("__ltie"),
          array_sort(collect_list(col("__ev"))).as("__evs"))
        .withColumn("__first", expr("try_element_at(__evs, 1)"))
        .withColumn("__from0",
          when(col("__lts").isNotNull && size(col("__evs")) > 0 &&
              (col("__first.ts_us") < col("__lts") ||
                (col("__first.ts_us") === col("__lts") &&
                  col("__first.__tie") <= col("__ltie"))),
            raise_error(concat(
              lit("transitionMatrixIncremental: batch event at ("),
              col("__first.ts_us").cast("string"), lit(","),
              col("__first.__tie").cast("string"),
              lit(") does not strictly follow persisted last ("),
              col("__lts").cast("string"), lit(","),
              col("__ltie").cast("string"), lit(") for user "),
              col(userCol).cast("string"),
              lit(" — batches must be time-partitioned per user"))))
            .otherwise(col("__lt"))))
    val delta = agg
      .withColumn("__pair", explode(concat(
        // boundary pair (state present AND batch events present)
        expr("""CASE WHEN __from0 IS NOT NULL AND size(__evs) > 0
               |THEN array(struct(__from0 AS from_type,
               |                  __evs[0].__ty AS to_type))
               |ELSE array() END""".stripMargin),
        // within-batch consecutive pairs off the sorted array
        expr("""CASE WHEN size(__evs) >= 2
               |THEN transform(sequence(1, size(__evs) - 1),
               |       i -> struct(__evs[i - 1].__ty AS from_type,
               |                   __evs[i].__ty AS to_type))
               |ELSE array() END""".stripMargin))))
      .groupBy(col("__pair.from_type").as("from_type"),
        col("__pair.to_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val newState = agg.select(col(userCol),
      when(size(col("__evs")) > 0, element_at(col("__evs"), -1)("__ty"))
        .otherwise(col("__lt")).as("last_type"),
      when(size(col("__evs")) > 0, element_at(col("__evs"), -1)("ts_us"))
        .otherwise(col("__lts")).as("last_ts"),
      when(size(col("__evs")) > 0, element_at(col("__evs"), -1)("__tie"))
        .otherwise(col("__ltie")).as("last_tie"))
    (delta, newState)
  }

  /** Fold a transition delta into the running census — pure addition. */
  def mergeTransitionCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("from_type"), col("to_type"))
      .agg(sum(col("n")).as("n"))

  /** Empty last-event state for [[transitionMatrixIncremental]].
    * `tieType`/`userType` must match the tie/user columns' runtime
    * types (event_id/user_id here default long) — the boundary-order
    * check compares ties directly and the fold unions state with the
    * batch's user column, so a mismatch is an AnalysisException on the
    * first batch. The streaming wrappers derive both from the batch
    * schema rather than trusting the defaults. */
  def emptyTransitionState(spark: org.apache.spark.sql.SparkSession,
                           userCol: String = "user_id",
                           tieType: org.apache.spark.sql.types.DataType =
                             org.apache.spark.sql.types.LongType,
                           userType: org.apache.spark.sql.types.DataType =
                             org.apache.spark.sql.types.LongType)
      : DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      StructType(Seq(StructField(userCol, userType),
        StructField("last_type", StringType),
        StructField("last_ts", LongType),
        StructField("last_tie", tieType))))
  }

  /** Event path census — [[transitionMatrix]] generalized from pairs to
    * k-grams: every run of `k` consecutive events in a user's
    * (ts, tie)-ordered history counts its type sequence, the "what do
    * users DO" report product analytics reads beyond first-order
    * transitions. Returns (path — types joined by '>', n, share_micro —
    * share of all k-runs); NULL user/ts/type events are excluded by
    * statement.
    *
    * Scale shape: the [[Sessionize]] argument again — k−1 lags ride ONE
    * per-user window sort (lags over the same frame share the sort),
    * then a map-side-combined count over ≤|types|^k groups (config^k,
    * not data) and a broadcast 1-row total. */
  def pathCensus(events: DataFrame, k: Int, tsUs: Column,
                 userCol: String = "user_id",
                 typeCol: String = "event_type",
                 tieCol: String = "event_id"): DataFrame = {
    require(k >= 2 && k <= 8, s"pathCensus: k=$k out of [2, 8]")
    import org.apache.spark.sql.functions.broadcast
    val w = Window.partitionBy(col(userCol))
      .orderBy(col("ts_us").asc, col(tieCol).asc)
    val base = events
      .withColumn("ts_us", tsUs.cast("long"))
      .filter(col(userCol).isNotNull && col("ts_us").isNotNull &&
        col(typeCol).isNotNull)
    val lagged = (k - 1 to 1 by -1).foldLeft(base) { (df, i) =>
      df.withColumn(s"__p$i", lag(col(typeCol), i).over(w))
    }
    val runs = lagged.filter(col(s"__p${k - 1}").isNotNull)
      .select(concat_ws(">",
        ((k - 1 to 1 by -1).map(i => col(s"__p$i")) :+ col(typeCol)): _*)
        .as("path"))
    val counts = runs.groupBy(col("path")).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("__t"))
    counts.crossJoin(broadcast(total))
      .withColumn("share_micro", expr("n * 1000000L DIV greatest(__t, 1L)"))
      .select(col("path"), col("n"), col("share_micro"))
  }

  /** Incremental path census — [[pathCensus]]'s run-over-run ingest
    * shape, the [[transitionMatrixIncremental]] contract generalized
    * from a last-event state to a last-(k−1)-events TAIL per user: a
    * k-gram ending at a batch event reaches back at most k−1 events, so
    * the persisted tail is exactly the state that stitches every
    * boundary-crossing run. The tail is ONE row per user with
    * (ts, tie, type) arrays ordered oldest→newest — single-row-per-user
    * so the bucketed store's per-user max-by combine (on the tail's last
    * (ts, tie)) stays the mergeable partial the replay protocol needs,
    * exactly as the 4-column transition state.
    *
    * Contract, inherited verbatim: batches time-partitioned per user in
    * the full window's (ts, tie) lexicographic order; a batch event at
    * or before the persisted tail's last (ts, tie) raises (equality too
    * — the full window's order of exact duplicates is nondeterministic,
    * so the incremental/full identity could not be guaranteed).
    *
    * Returns (this batch's path-count DELTA — fold by addition via
    * [[mergePathCounts]], derive shares via [[pathReportFromCounts]];
    * the new tail state). Identity: deltas summed over b1…bn equal the
    * full-corpus [[pathCensus]] counts exactly — only windows ENDING at
    * a batch event count, and windows ending at a carried tail event
    * were counted by the fold that ingested that event.
    *
    * Scale shape: state is user-cardinality (one row, ≤ k−1 array
    * elements); the fold is ONE user-keyed aggregation over (state ∪
    * batch events) — the [[funnelIncremental]] shape — with the
    * per-user order from array_sort on the (ts, tie, type) struct
    * instead of a whole-batch window, and the delta aggregates into
    * ≤|types|^k groups. The state shuffles once, is never required to
    * be broadcast-small, and per-user memory is the user's batch
    * events plus the ≤ k−1 tail (the sessionize bound). */
  def pathCensusIncremental(newEvents: DataFrame, lastState: DataFrame,
                            k: Int, tsUs: Column,
                            userCol: String = "user_id",
                            typeCol: String = "event_type",
                            tieCol: String = "event_id")
      : (DataFrame, DataFrame) = {
    require(k >= 2 && k <= 8, s"pathCensusIncremental: k=$k out of [2, 8]")
    val evs = newEvents
      .withColumn("ts_us", tsUs.cast("long"))
      .filter(col(userCol).isNotNull && col("ts_us").isNotNull &&
        col(typeCol).isNotNull)
      .select(col(userCol), col(typeCol).as("__ty"), col("ts_us"),
        col(tieCol).as("__tie"))
    val tieT = evs.schema("__tie").dataType
    // ONE user-keyed aggregation over (state ∪ batch events) — the
    // funnelIncremental shape generalized to the k−1-event tail: the
    // tail arrays ride max() (one state row per user, event rows null
    // there), the batch sorts per user via array_sort on the
    // (ts, tie, type) struct — the full window's lexicographic order
    // with no whole-batch window sort, no boundary join, no tail
    // semi-join, no carried anti-join; the state shuffles once and
    // never needs to be broadcast-small.
    val evT = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ts_us",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("__tie", tieT),
      org.apache.spark.sql.types.StructField("__ty",
        org.apache.spark.sql.types.StringType)))
    val stRows = graft.CacheBarriers.barrier(lastState).select(
      col(userCol), col("tail_ts"), col("tail_tie"), col("tail_type"),
      lit(null).cast(evT).as("__ev"))
    val evRows = evs.select(col(userCol),
      lit(null).cast("array<long>").as("tail_ts"),
      lit(null).cast(org.apache.spark.sql.types.ArrayType(tieT))
        .as("tail_tie"),
      lit(null).cast("array<string>").as("tail_type"),
      struct(col("ts_us"), col("__tie"), col("__ty")).as("__ev"))
    // the batch's min event must strictly follow the tail's last
    // (ts, tie) — the row-lazy raise rides the sorted batch array, so it
    // cannot be pruned out of either output's dataflow
    val agg = graft.CacheBarriers.barrier(
      stRows.unionByName(evRows)
        .groupBy(col(userCol))
        .agg(max(col("tail_ts")).as("__tts"),
          max(col("tail_tie")).as("__ttie"),
          max(col("tail_type")).as("__tty"),
          array_sort(collect_list(col("__ev"))).as("__evs0"))
        .withColumn("__bts", expr("try_element_at(__tts, -1)"))
        .withColumn("__btie", expr("try_element_at(__ttie, -1)"))
        .withColumn("__first", expr("try_element_at(__evs0, 1)"))
        .withColumn("__evs",
          when(col("__bts").isNotNull && size(col("__evs0")) > 0 &&
              (col("__first.ts_us") < col("__bts") ||
                (col("__first.ts_us") === col("__bts") &&
                  col("__first.__tie") <= col("__btie"))),
            raise_error(concat(
              lit("pathCensusIncremental: batch event at ("),
              col("__first.ts_us").cast("string"), lit(","),
              col("__first.__tie").cast("string"),
              lit(") does not strictly follow the persisted tail end ("),
              col("__bts").cast("string"), lit(","),
              col("__btie").cast("string"), lit(") for user "),
              col(userCol).cast("string"),
              lit(" — batches must be time-partitioned per user"))))
            .otherwise(col("__evs0")))
        // old tail ∪ sorted batch, as one (ts, tie, type) struct array
        .withColumn("__full", concat(
          coalesce(expr(
            """transform(arrays_zip(__tts, __ttie, __tty),
              |  x -> struct(x.__tts AS ts_us, x.__ttie AS __tie,
              |              x.__tty AS __ty))""".stripMargin),
            expr("array()").cast(
              org.apache.spark.sql.types.ArrayType(evT))),
          col("__evs")))
        .withColumn("__ntail", least(lit(k - 1), size(col("__full")))))
    // only windows ENDING at a batch event count (a window ending in the
    // carried tail was counted by the fold that ingested that event):
    // 0-based end indices from max(size(tail), k−1) to size(full)−1
    val delta = agg
      .withColumn("__lo",
        greatest(size(col("__full")) - size(col("__evs")), lit(k - 1)))
      .withColumn("path", explode(expr(
        s"""CASE WHEN size(__full) - 1 >= __lo
           |THEN transform(sequence(__lo, size(__full) - 1),
           |  i -> concat_ws('>', transform(sequence(i - ${k - 1}, i),
           |         m -> element_at(__full, m + 1).__ty)))
           |ELSE array() END""".stripMargin)))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
    val newState = agg
      .withColumn("__t2", expr(
        "slice(__full, size(__full) - __ntail + 1, __ntail)"))
      .select(col(userCol),
        expr("transform(__t2, x -> x.ts_us)").as("tail_ts"),
        expr("transform(__t2, x -> x.__tie)").as("tail_tie"),
        expr("transform(__t2, x -> x.__ty)").as("tail_type"))
    (delta, newState)
  }

  /** Fold a path-count delta into the running census — pure addition. */
  def mergePathCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("path")).agg(sum(col("n")).as("n"))

  /** Derive [[pathCensus]]'s report (path, n, share_micro) from a folded
    * path-count census. */
  def pathReportFromCounts(counts: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val total = counts.agg(sum(col("n")).as("__t"))
    counts.crossJoin(broadcast(total))
      .withColumn("share_micro", expr("n * 1000000L DIV greatest(__t, 1L)"))
      .select(col("path"), col("n"), col("share_micro"))
  }

  /** Empty tail state for [[pathCensusIncremental]]. Type contract as
    * [[emptyTransitionState]]: `tieType`/`userType` must match the
    * batch's runtime column types or the first fold's union raises. */
  def emptyPathState(spark: org.apache.spark.sql.SparkSession,
                     userCol: String = "user_id",
                     tieType: org.apache.spark.sql.types.DataType =
                       org.apache.spark.sql.types.LongType,
                     userType: org.apache.spark.sql.types.DataType =
                       org.apache.spark.sql.types.LongType)
      : DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      StructType(Seq(StructField(userCol, userType),
        StructField("tail_ts", ArrayType(LongType)),
        StructField("tail_tie", ArrayType(tieType)),
        StructField("tail_type", ArrayType(StringType)))))
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
    * already-day-deduped table (far smaller than events) — CARRYING its
    * window offset, so ONE (user, end-day) aggregation (min offset)
    * serves both counts: offset 0 present ⟺ the user was active ON the
    * day (DAU), any row ⟺ active in its trailing window (WAU). The
    * round-11 shape built DAU and WAU as two independent aggregation
    * chains over the activity table and joined them — one full pass, one
    * distinct, and one join more than this. Days with only window
    * support (no direct activity) drop, preserving the report's
    * row-existence rule. */
  def activeUsers(events: DataFrame, tsUs: Column, windowDays: Int = 7,
                  userCol: String = "user_id"): DataFrame = {
    require(windowDays >= 1, s"activeUsers: windowDays=$windowDays")
    val days = events
      .withColumn("ts_us", tsUs.cast("long"))
      .filter(col(userCol).isNotNull && col("ts_us").isNotNull)
      .select(col(userCol).as("__u"),
        expr("ts_us DIV 86400000000L").as("day"))
      .distinct()
    fusedActiveReport(
      days.select(col("__u"), col("day").as("__d0"),
          explode(sequence(lit(0L), lit((windowDays - 1).toLong)))
            .as("__ux"))
        .select(col("__u"), (col("__d0") + col("__ux")).as("day"),
          col("__ux")))
  }

  /** The shared (user, end-day, offset) → (day, dau, wau, stickiness)
    * reduction of [[activeUsers]] and [[activeUsersDeltaFrom]]: collapse
    * to per-(user, day) min offset (distinctness), then count both
    * measures in one day-keyed pass; `dau > 0` keeps exactly the days
    * with direct activity (the inner-join row rule of the two-chain
    * form). */
  private def fusedActiveReport(support: DataFrame): DataFrame =
    support
      .groupBy(col("__u"), col("day")).agg(min(col("__ux")).as("__mx"))
      .groupBy(col("day")).agg(
        count(when(col("__mx") === 0L, 1)).as("dau"),
        count(lit(1)).as("wau"))
      .filter(col("dau") > 0L)
      .withColumn("stickiness_micro",
        expr("dau * 1000000L DIV greatest(wau, 1L)"))
      .select(col("day"), col("dau"), col("wau"), col("stickiness_micro"))

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
    // the delta core's folded frame IS the new state here (full state in,
    // full state ∪ fresh out) — returning it directly shares one
    // persisted union instead of materializing the same frame twice
    val (delta, _, folded) = activeUsersDeltaFrom(
      activityPairs(newEvents, tsUs, userCol), state, windowDays)
    (delta, folded)
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
    * pairs, the folded slice ∪ fresh union — already persisted, so a
    * caller whose slice is the full state reuses it as the new state
    * instead of materializing the same union twice). */
  private[graft] def activeUsersDeltaFrom(batchPairs: DataFrame,
                                          stateSlice: DataFrame,
                                          windowDays: Int)
      : (DataFrame, DataFrame, DataFrame) = {
    val fresh = graft.CacheBarriers.barrier(
      batchPairs.join(stateSlice, Seq("__u", "day"), "left_anti"))
    val folded = graft.CacheBarriers.barrier(
      stateSlice.unionByName(fresh))
    // a novel pair at day D changes DAU(D) and WAU(D … D+w−1). No
    // distinct and no intersection with the folded day set: the semi
    // join below dedupes its build side by definition, and an affected
    // day WITHOUT direct activity aggregates to dau = 0 and is dropped
    // by [[fusedActiveReport]]'s row rule — the two extra shuffles the
    // round-11 shape paid for the same rows
    val affected = fresh
      .select(explode(sequence(col("day"),
        col("day") + (windowDays - 1))).as("day"))
    // fused DAU+WAU ([[fusedActiveReport]]): the explode carries its
    // offset so one (user, day) aggregation feeds both counts
    val delta = fusedActiveReport(
      folded
        .select(col("__u"), col("day").as("__d0"),
          explode(sequence(lit(0L), lit((windowDays - 1).toLong)))
            .as("__ux"))
        .select(col("__u"), (col("__d0") + col("__ux")).as("day"),
          col("__ux"))
        .join(affected, Seq("day"), "left_semi"))
    (delta, fresh, folded)
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
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      StructType(Seq(StructField("__u", LongType),
        StructField("day", LongType))))
  }

  /** Rolling event-time features — at every event, the user's trailing
    * activity over each window: `n_<name>` (event count) and
    * `sum_<name>` (sum of `valueCol`, an INTEGER expression — the caller
    * floors/scales floats so the accumulation is exact and replayable
    * cross-engine), plus `prev_gap_us` (micros since the user's previous
    * event; NULL on their first). The feature-engineering pass a
    * training pipeline runs before sampling: recency/frequency at the
    * moment of each example, no future leakage by construction.
    *
    * Window semantics are RANGE (value-based): the frame is every event
    * with ts in [cur − windowUs, cur] INCLUSIVE of both edges and of
    * equal-timestamp peers later in tie order — the standard SQL RANGE
    * frame, replayed identically by the oracle. NULL user/ts events are
    * excluded by statement.
    *
    * Scale shape: ONE user-keyed exchange; the lag window sorts (user,
    * ts, tie) and every RANGE frame rides the same sort (its required
    * (user, ts) prefix is satisfied), so all features stack as Window
    * nodes over a single shuffle+sort — partitions are user-sized.
    * PlanAuditSpec pins one exchange, one sort. */
  def rollingFeatures(events: DataFrame, tsUs: Column, valueCol: Column,
                      windows: Seq[(String, Long)],
                      userCol: String = "user_id",
                      tieCol: String = "event_id"): DataFrame = {
    require(windows.nonEmpty, "rollingFeatures: no windows")
    require(windows.map(_._1).distinct.length == windows.length,
      "rollingFeatures: duplicate window names")
    require(windows.forall(_._2 > 0),
      s"rollingFeatures: non-positive window in $windows")
    rollingClashCheck(events, windows)
    val base = events
      .withColumn("ts_us", tsUs.cast("long"))
      .filter(col(userCol).isNotNull && col("ts_us").isNotNull)
      .withColumn("__v", valueCol.cast("long"))
    stackFeatures(base, windows, userCol, tieCol).drop("__v")
  }

  /** Working/output-name clash guard for the rolling-features family:
    * an input frame already carrying `ts_us`/`__v` (the working names it
    * would silently clobber) or a feature output name computes wrong
    * results silently — fail loudly instead, like the as-of/scd2
    * checks. */
  private def rollingClashCheck(events: DataFrame,
                                windows: Seq[(String, Long)]): Unit = {
    val reserved = Seq("ts_us", "__v", "prev_gap_us") ++
      windows.flatMap { case (n, _) => Seq(s"n_$n", s"sum_$n") }
    val clash = events.columns.toSeq.intersect(reserved)
    require(clash.isEmpty, s"input columns ${clash.mkString(", ")} " +
      "collide with rolling-features working/output names — rename them")
  }

  /** The shared frame stack: `prev_gap_us` + per-window count/sum over a
    * frame that already carries `ts_us` and `__v`. */
  private def stackFeatures(base: DataFrame, windows: Seq[(String, Long)],
                            userCol: String, tieCol: String): DataFrame = {
    val tieW = Window.partitionBy(col(userCol))
      .orderBy(col("ts_us").asc, col(tieCol).asc)
    val out0 = base.withColumn("prev_gap_us",
      col("ts_us") - lag(col("ts_us"), 1).over(tieW))
    windows.foldLeft(out0) { case (df, (name, w)) =>
      val rw = Window.partitionBy(col(userCol)).orderBy(col("ts_us").asc)
        .rangeBetween(-w, 0)
      df.withColumn(s"n_$name", count(lit(1)).over(rw))
        .withColumn(s"sum_$name", sum(col("__v")).over(rw))
    }
  }

  /** Empty state for [[rollingFeaturesIncremental]]: the minimal replay
    * slice — (user, tie, ts_us, __v). */
  def emptyRollingState(spark: org.apache.spark.sql.SparkSession,
                        userCol: String = "user_id",
                        tieCol: String = "event_id"): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      StructType(Seq(StructField(userCol, LongType),
        StructField(tieCol, LongType), StructField("ts_us", LongType),
        StructField("__v", LongType))))
  }

  /** Incremental rolling features — the log-ingest shape: a batch that is
    * STRICTLY time-partitioned globally (every batch event after every
    * previously folded one — strict because a boundary-straddling
    * timestamp tie would put later RANGE peers in an already-shipped
    * row's frame; enforced loudly, never trusted) computes its features
    * against (carried state ∪ batch), and the new state keeps only what
    * any future batch can still see: events within the widest window of
    * the global tail, plus each user's single latest event (the
    * `prev_gap_us` anchor — a user silent for a year still gets their
    * true gap). Output ∪ over batches equals [[rollingFeatures]] over
    * the full corpus EXACTLY (q206's oracle is q204's verbatim); state
    * is window-bounded plus one row per user, never proportional to
    * history.
    *
    * Scale shape: the feature stack is the same one-exchange window
    * pass over (state ∪ batch); the two global tails ride broadcast
    * one-row frames (control-plane); the latest-per-user keep flag is a
    * per-user max over the already-partitioned frame. */
  def rollingFeaturesIncremental(newEvents: DataFrame, state: DataFrame,
                                 tsUs: Column, valueCol: Column,
                                 windows: Seq[(String, Long)],
                                 userCol: String = "user_id",
                                 tieCol: String = "event_id")
      : (DataFrame, DataFrame) = {
    require(windows.nonEmpty, "rollingFeaturesIncremental: no windows")
    rollingClashCheck(newEvents, windows)
    val maxW = windows.map(_._2).max
    val st = graft.CacheBarriers.barrier(state)
    // contract check rides a broadcast one-row tail and is consumed by
    // both output paths (the batch rows flow into features AND state)
    val stTail = st.agg(max(col("ts_us")).as("__mst"))
    val b = newEvents
      .withColumn("ts_us", tsUs.cast("long"))
      .filter(col(userCol).isNotNull && col("ts_us").isNotNull)
      .withColumn("__v", valueCol.cast("long"))
      .crossJoin(broadcast(stTail))
      .withColumn("__chk",
        when(col("__mst").isNotNull && col("ts_us") <= col("__mst"),
          raise_error(concat(
            lit("rollingFeaturesIncremental: batch event at "),
            col("ts_us").cast("string"),
            lit(" at-or-before the folded tail "),
            col("__mst").cast("string"),
            lit(" — batches must be strictly time-partitioned"))))
          .otherwise(lit(1)))
      .filter(col("__chk") === 1).drop("__chk", "__mst")
    val u = graft.CacheBarriers.barrier(
      st.withColumn("__st", lit(true))
        .unionByName(b.withColumn("__st", lit(false)),
          allowMissingColumns = true))
    val features = stackFeatures(u, windows, userCol, tieCol)
      .filter(!col("__st")).drop("__st", "__v")
    (features, pruneRollingState(u, maxW, userCol, tieCol))
  }

  /** The rolling-state retention rule: keep events within `maxW` of the
    * frame's own tail (strict ≥ keeps the inclusive frame edge) plus
    * each user's single latest event (the gap anchor). Monotone — early
    * pruning against a lower tail never drops a row the final tail
    * would keep — and idempotent over duplicate rows, which makes it
    * the replay-safe combine the bucketed streaming twin needs
    * ([[graft.streaming.StreamingRollingFeatures]]: prune(distinct(prev
    * ∪ slice)) per bucket; a per-bucket tail only RETAINS MORE, and a
    * kept-extra row older than any future frame contributes nothing). */
  def pruneRollingState(state: DataFrame, maxW: Long,
                        userCol: String = "user_id",
                        tieCol: String = "event_id"): DataFrame = {
    val tail = state.agg(max(col("ts_us")).as("__g"))
    val lastW = Window.partitionBy(col(userCol))
    state
      .withColumn("__last",
        struct(col("ts_us"), col(tieCol)) <=>
          max(struct(col("ts_us"), col(tieCol))).over(lastW))
      .crossJoin(broadcast(tail))
      .filter(col("ts_us") >= col("__g") - maxW || col("__last"))
      .select(col(userCol), col(tieCol), col("ts_us"), col("__v"))
  }

  /** Temporal per-key holdout — the recommendation-eval split: each
    * user's LAST `k` events (by (ts, tie) desc) are `test`, the rest
    * `train` — the leave-last-k-out discipline that keeps evaluation
    * strictly in each user's future (a random split leaks future
    * interactions into training). Users with ≤ k events land entirely
    * in `test` — stated; filter by the per-user census if a minimum
    * train history is required. One user-keyed exchange, one sort;
    * NULL user/ts excluded by statement. Adds `ts_us` and `split`. */
  def temporalHoldout(events: DataFrame, k: Int, tsUs: Column,
                      userCol: String = "user_id",
                      tieCol: String = "event_id"): DataFrame = {
    require(k > 0, s"temporalHoldout: k=$k must be positive")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col("ts_us").desc, col(tieCol).desc)
    events
      .withColumn("ts_us", tsUs.cast("long"))
      .filter(col(userCol).isNotNull && col("ts_us").isNotNull)
      .withColumn("__rn", row_number().over(w))
      .withColumn("split", when(col("__rn") <= k, lit("test"))
        .otherwise(lit("train")))
      .drop("__rn")
  }

  /** Skip-gram pair mining — the word2vec/item2vec training-pair shape
    * over sessionized event sequences: for every event, its co-occurring
    * successors within `maxDist` positions INSIDE the same session,
    * counted by (earlier type, later type, distance). NOT a self-join:
    * each distance is a `lead(type, d)` frame, and all `maxDist` frames
    * stack on the session sort — one exchange, one sort, zero joins
    * (the self-join formulation shuffles the corpus twice and explodes
    * on hot sessions before the distance filter prunes). Pairs are
    * ordered (a precedes b); ties inside a timestamp resolve by the
    * session sort's tie column, so counts replay cross-engine. */
  def skipgramPairs(events: DataFrame, gapUs: Long, maxDist: Int,
                    tsUs: Column, userCol: String = "user_id",
                    typeCol: String = "event_type",
                    tieCol: String = "event_id"): DataFrame = {
    require(maxDist > 0, s"skipgramPairs: maxDist=$maxDist must be positive")
    val sess = Sessionize.withSessions(
      events.filter(col(typeCol).isNotNull), gapUs, tsUs, userCol, tieCol)
    val w = Window.partitionBy(col(userCol), col("session_seq"))
      .orderBy(col("ts_us").asc, col(tieCol).asc)
    val withLeads = (1 to maxDist).foldLeft(sess) { (df, d) =>
      df.withColumn(s"__l$d", lead(col(typeCol), d).over(w))
    }
    withLeads
      .withColumn("__p", explode(array((1 to maxDist).map(d =>
        struct(col(s"__l$d").as("b"), lit(d).as("dist"))): _*)))
      .filter(col("__p.b").isNotNull)
      .groupBy(col(typeCol).as("a"), col("__p.b").as("b"),
        col("__p.dist").as("dist"))
      .agg(count(lit(1)).as("n"))
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
