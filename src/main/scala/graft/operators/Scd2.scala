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
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("ts_us").asc, col(tieCol).asc)
    changes
      .withColumn("ts_us", tsUs.cast("long"))
      .filter(keyCols.map(col(_).isNotNull).reduce(_ && _) &&
        col("ts_us").isNotNull)
      .withColumn("value", valueCol)
      .withColumn("__pts", lag(col("ts_us"), 1).over(w))
      .withColumn("__pval", lag(col("value"), 1).over(w))
      // first row per key (no predecessor) or a null-safe value change
      .filter(col("__pts").isNull || !(col("value") <=> col("__pval")))
      .withColumn("valid_from_us", col("ts_us"))
      .withColumn("valid_to_us", lead(col("ts_us"), 1).over(w))
      .select(keyCols.map(col) :+ col("value") :+ col("valid_from_us")
        :+ col("valid_to_us"): _*)
  }
}
