package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) interval build — compress a
  * change-event stream into per-key validity intervals: consecutive
  * events carrying the SAME value collapse into one interval, a changed
  * value closes the open interval and opens the next. The history table
  * behind every point-in-time question: feed the intervals to
  * [[AsofJoin]] (match on `valid_from_us`) or [[IntervalJoin]] for
  * leakage-free "state as of the example's moment" attachment.
  *
  * Interval semantics: `[valid_from_us, valid_to_us)` — from inclusive,
  * to exclusive (the instant a new value arrives, the old one stops
  * being true); the key's last interval is open (`valid_to_us` NULL).
  * Value comparison is NULL-SAFE: two consecutive NULL states collapse,
  * NULL→value and value→NULL are real changes.
  *
  * Determinism: events order by (ts_us, tieCol) per key — equal-instant
  * changes resolve in tie order, so the interval chain replays
  * cross-engine. NULL key/ts events are excluded by statement.
  *
  * Scale shape: ONE key exchange and one (key, ts, tie) sort; the
  * change-flag lag, the start filter, and the closing lead all ride it
  * (the filter preserves the partitioning, so the second window needs no
  * new shuffle — PlanAuditSpec pins one exchange). No aggregation pass:
  * an island's start row IS its interval row. Partitions are key-sized
  * histories. */
object Scd2 {

  /** The interval table: key columns, `value` (the state), and
    * `valid_from_us` / `valid_to_us` BIGINT micros. */
  def intervals(changes: DataFrame, keyCols: Seq[String], tsUs: Column,
                valueCol: Column, tieCol: String): DataFrame = {
    require(keyCols.nonEmpty, "scd2 needs at least one key column")
    // internal working names stay off the input namespace entirely (the
    // caller's own ts_us/value columns are never clobbered mid-plan —
    // tsUs/valueCol expressions resolve against the untouched frame);
    // a frame already carrying a working name still fails loudly
    val wclash = changes.columns.toSeq.intersect(WorkingCols)
    require(wclash.isEmpty, s"input columns ${wclash.mkString(", ")} " +
      "collide with scd2 working names — rename them")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__sts").asc, col(tieCol).asc)
    changes
      .withColumn("__sts", tsUs.cast("long"))
      .withColumn("__sval", valueCol)
      .filter(keyCols.map(col(_).isNotNull).reduce(_ && _) &&
        col("__sts").isNotNull)
      .withColumn("__pts", lag(col("__sts"), 1).over(w))
      .withColumn("__pval", lag(col("__sval"), 1).over(w))
      // first row per key (no predecessor) or a null-safe value change
      .filter(col("__pts").isNull || !(col("__sval") <=> col("__pval")))
      .select(keyCols.map(col) :+ col("__sval").as("value")
        :+ col("__sts").as("valid_from_us")
        :+ lead(col("__sts"), 1).over(w).as("valid_to_us"): _*)
  }

  /** Internal working-column names — inputs must not carry these. */
  private val WorkingCols = Seq("__sts", "__sval", "__slast", "__st",
    "__v", "__tail", "__pts", "__pval", "__to")

  /** Empty state for [[intervalsIncremental]]: one row per key — the
    * OPEN interval's opening change event (value, valid_from, its tie)
    * plus `last_ts_us`, the latest event the key has folded (the
    * time-partition fence; collapsed events advance it without opening
    * intervals). */
  def emptyState(spark: org.apache.spark.sql.SparkSession,
                 keyCols: Seq[String] = Seq("user_id"),
                 tieCol: String = "event_id"): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      StructType(keyCols.map(StructField(_, LongType)) ++ Seq(
        StructField("value", LongType), StructField("valid_from_us", LongType),
        StructField(tieCol, LongType), StructField("last_ts_us", LongType))))
  }

  /** Incremental SCD2 — the log-ingest shape: the carried state row IS
    * the open interval's opening change event, so it simply re-enters
    * the same islands algebra ahead of the batch (a first batch event
    * carrying the same value collapses into it — the interval keeps its
    * original `valid_from`; a changed value closes it at the change
    * instant). Returns (closed intervals — final, safe to ship; new
    * state — one row per key). Closed ∪ open-as-intervals after folding
    * b1…bn equals [[intervals]](b1 ∪ … ∪ bn) EXACTLY (q209 reuses
    * q205's oracle verbatim); state is one row per key, never
    * proportional to history.
    *
    * Contract: every batch event STRICTLY after the key's folded tail
    * (`last_ts_us` — advanced by collapsed events too, which never open
    * intervals but do fence reordering). Strict, not at-or-after: an
    * event already folded at the tail instant (possibly collapsed and
    * discarded from state) cannot be re-tie-ordered against a batch
    * arrival at that same instant, so equal-ts admission would silently
    * break the fold identity. Enforced by a row-lazy raise riding the
    * value column every output path consumes. */
  def intervalsIncremental(newChanges: DataFrame, state: DataFrame,
                           keyCols: Seq[String], tsUs: Column,
                           valueCol: Column, tieCol: String)
      : (DataFrame, DataFrame) = {
    require(keyCols.nonEmpty, "scd2 needs at least one key column")
    val wclash = newChanges.columns.toSeq.intersect(WorkingCols)
    require(wclash.isEmpty, s"input columns ${wclash.mkString(", ")} " +
      "collide with scd2 working names — rename them")
    val st = graft.CacheBarriers.barrier(state)
    val syn = st.select(keyCols.map(col) ++ Seq(col("value").as("__sval"),
      col("valid_from_us").as("__sts"), col(tieCol),
      col("last_ts_us").as("__slast"), lit(true).as("__st")): _*)
    val b = newChanges
      .withColumn("__sts", tsUs.cast("long"))
      .withColumn("__sval", valueCol)
      .filter(keyCols.map(col(_).isNotNull).reduce(_ && _) &&
        col("__sts").isNotNull)
      .select(keyCols.map(col) ++ Seq(col("__sval"), col("__sts"),
        col(tieCol), lit(null).cast("long").as("__slast"),
        lit(false).as("__st")): _*)
    val keys = keyCols.map(col)
    // the state row sorts before any batch row: its ts is at-or-before
    // the fence, and at an equal instant __st orders it first
    val w = Window.partitionBy(keys: _*)
      .orderBy(col("__sts").asc, col("__st").desc, col(tieCol).asc)
    val fence = max(when(col("__st"), col("__slast")))
      .over(Window.partitionBy(keys: _*))
    val tail = max(col("__sts")).over(Window.partitionBy(keys: _*))
    val marked = syn.unionByName(b)
      .withColumn("__v",
        when(!col("__st") && col("__sts") <= fence,
          raise_error(concat(
            lit("scd2 incremental: batch event at "),
            col("__sts").cast("string"),
            lit(" is at-or-before the folded tail "),
            fence.cast("string"),
            lit(" — batches must be time-partitioned per key, " +
              "strictly after the folded tail"))))
          .otherwise(col("__sval")))
      .withColumn("__tail", tail)
      .withColumn("__pts", lag(col("__sts"), 1).over(w))
      .withColumn("__pval", lag(col("__v"), 1).over(w))
      .filter(col("__pts").isNull || !(col("__v") <=> col("__pval")))
      .withColumn("__to", lead(col("__sts"), 1).over(w))
    val closed = marked.filter(col("__to").isNotNull)
      .select(keys :+ col("__v").as("value") :+
        col("__sts").as("valid_from_us") :+
        col("__to").as("valid_to_us"): _*)
    val newState = marked.filter(col("__to").isNull)
      .select(keys ++ Seq(col("__v").as("value"),
        col("__sts").as("valid_from_us"), col(tieCol),
        col("__tail").as("last_ts_us")): _*)
    (closed, newState)
  }
}
