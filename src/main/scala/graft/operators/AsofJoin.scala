package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join — for every left row, the single right row
  * with the greatest right timestamp at-or-before the left's (backward;
  * the smallest at-or-after for forward), per key, optionally within a
  * tolerance. The classic training-data shape: attach "the user's state
  * as it was when this example happened" without leaking the future —
  * feature lookup against an event log, label-to-context attachment,
  * price-as-of-order. The reference has no time-travel join (its relate
  * joins are identity equi-joins, monstache.go:2045-2133); this is the
  * operator the brief names as a Spark gap, built the Spark-first way.
  *
  * NOT a join under the hood: a naive `l JOIN r ON key AND r.ts <= l.ts`
  * explodes quadratically on hot keys before the argmax prunes it.
  * Instead both sides UNION into one stream, shuffle once on the key,
  * sort once by (ts, side, tie), and a single running `last(payload,
  * ignoreNulls)` window hands every left row the most recent right row —
  * the distributed merge-asof. One exchange, one sort, zero joins; the
  * window partition is key-sized (one key's merged history), so a 100×
  * corpus scales the key count, not the partition invariant. The skew
  * lever for a firehose key is the standard one ([[Skew]]).
  *
  * Determinism: right rows sharing (key, ts) resolve to the largest
  * `rightTie`; left rows never reorder rights (side sorts right-first at
  * equal ts, so a same-instant right IS visible — both bounds
  * inclusive). Payload rides ONE struct column, so a right row whose
  * payload fields are legitimately NULL still matches (the struct is
  * non-null; `ignoreNulls` skips only absent rows, never real values).
  *
  * NULL statements (stated, not ridden on window defaults): right rows
  * with a NULL key or NULL timestamp can never be anyone's match and are
  * excluded; left rows always survive — a NULL-key or NULL-ts left row
  * simply matches nothing.
  */
object AsofJoin {

  /** Marker column name for [[asofBackwardIncremental]] state rows. */
  private[operators] val StateCol = "__asof_state"

  /** Backward as-of join (inclusive): left columns unchanged, plus
    * `ts_us` (the left timestamp in BIGINT micros), plus every non-key
    * right column as `<prefix><name>`, plus `<prefix>ts_us` (the matched
    * right timestamp; NULL when nothing matched or the match fell
    * outside `toleranceUs`). */
  def asofBackward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                   leftTs: Column, rightTs: Column, rightTie: String,
                   toleranceUs: Option[Long] = None,
                   prefix: String = "asof_"): DataFrame =
    asofImpl(left, right, keyCols, leftTs, rightTs, rightTie, toleranceUs,
      prefix, sign = 1L)

  /** Forward as-of join (inclusive): the smallest right timestamp
    * at-or-after each left row — "the next state change after this
    * event". Same machinery with the sort order mirrored; ties at equal
    * (key, ts) still resolve to the largest `rightTie`. */
  def asofForward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                  leftTs: Column, rightTs: Column, rightTie: String,
                  toleranceUs: Option[Long] = None,
                  prefix: String = "asof_"): DataFrame =
    asofImpl(left, right, keyCols, leftTs, rightTs, rightTie, toleranceUs,
      prefix, sign = -1L)

  private def asofImpl(left: DataFrame, right: DataFrame,
                       keyCols: Seq[String], leftTs: Column, rightTs: Column,
                       rightTie: String, toleranceUs: Option[Long],
                       prefix: String, sign: Long): DataFrame = {
    require(keyCols.nonEmpty, "asof join needs at least one key column")
    toleranceUs.foreach(t => require(t >= 0, s"toleranceUs=$t: negative " +
      "tolerance matches nothing — pass None for unbounded"))
    val guarded = right.columns.contains(StateCol)
    val payload = right.columns.toSeq
      .filterNot(keyCols.contains).filterNot(_ == StateCol)
    require(payload.contains(rightTie),
      s"rightTie=$rightTie must be a non-key right column")
    val reserved = payload.map(prefix + _) ++ Seq(prefix + "ts_us", "ts_us")
    val clash = left.columns.toSeq.intersect(reserved)
    require(clash.isEmpty, s"left columns ${clash.mkString(", ")} collide " +
      s"with the as-of output — rename or change prefix")
    // internal working names: a caller frame already carrying one would
    // compute silently wrong results — fail loudly like the output check
    val working = Seq("__ats", "__aside", "__atie", "__am", "__am0",
      "__am1", "__stts")
    val wclashL = left.columns.toSeq.intersect(working)
    require(wclashL.isEmpty, s"left columns ${wclashL.mkString(", ")} " +
      "collide with as-of working names — rename them")
    val wclashR = right.columns.toSeq.intersect(working)
    require(wclashR.isEmpty, s"right columns ${wclashR.mkString(", ")} " +
      "collide with as-of working names — rename them")

    // right rows: key + micros ts + ONE payload struct (match fields ride
    // inside so a NULL payload value never un-matches a row)
    val r2 = right
      .withColumn("__ats", rightTs.cast("long"))
      .filter(keyCols.map(col(_).isNotNull).reduce(_ && _) &&
        col("__ats").isNotNull)
      .select(keyCols.map(col) ++ Seq(
        col("__ats"), lit(0L).as("__aside"), col(rightTie).as("__atie"),
        (if (guarded) col(StateCol) else lit(false)).as(StateCol),
        struct(col("__ats").as("__mts") +: payload.map(col): _*)
          .as("__am")): _*)
    // left rows: every left column survives; match columns arrive null
    // via unionByName(allowMissing) and fill in from the window
    val l2 = left
      .withColumn("__ats", leftTs.cast("long"))
      .withColumn("__aside", lit(1L))
    val unioned = r2.unionByName(l2, allowMissingColumns = true)

    val keys = keyCols.map(col)
    val ord = col("__ats") * lit(sign)
    val w = Window.partitionBy(keys: _*)
      .orderBy(ord.asc_nulls_first, col("__aside").asc,
        col("__atie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matchedRaw = last(col("__am"), ignoreNulls = true).over(w)
    // incremental left-guard: a left row older than the key's state row
    // would need history the state already compacted away — fail loudly
    // (the right-side twin of this check lives in latestRights)
    val stateTs = if (guarded)
      max(when(col(StateCol), col("__ats")))
        .over(Window.partitionBy(keys: _*))
    else lit(null).cast("long")
    val lagOk = toleranceUs match {
      case Some(t) => (col("__ats") - col("__am0.__mts")) * lit(sign) <= t
      case None => lit(true)
    }
    val out = unioned
      .withColumn("__am0", matchedRaw)
      .withColumn("__stts", stateTs)
      .filter(col("__aside") === 1L)
      .withColumn("__am1",
        when(col("__stts").isNotNull && col("__ats") < col("__stts"),
          raise_error(concat(
            lit("asof incremental: left row at "),
            col("__ats").cast("string"),
            lit(" precedes the compacted state at "),
            col("__stts").cast("string"),
            lit(" — batches must be time-partitioned per key"))))
          .when(col("__am0").isNotNull && lagOk, col("__am0"))
          .otherwise(lit(null).cast(r2.schema("__am").dataType)))
    out.select(left.columns.map(col) ++ Seq(col("__ats").as("ts_us"),
      col("__am1.__mts").as(prefix + "ts_us")) ++
      payload.map(c => col("__am1").getField(c).as(prefix + c)): _*)
  }

  /** The latest right row per key — the compact as-of state: exactly one
    * right-shaped row per key, the one a future backward as-of needs
    * when every future left is at-or-after it. Feed it back as `state`
    * in [[asofBackwardIncremental]]. */
  def latestRights(right: DataFrame, keyCols: Seq[String], rightTs: Column,
                   rightTie: String): DataFrame = {
    val payload = right.columns.toSeq.filterNot(keyCols.contains)
    right
      .withColumn("__ats", rightTs.cast("long"))
      .filter(keyCols.map(col(_).isNotNull).reduce(_ && _) &&
        col("__ats").isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(struct(payload.map(col): _*),
        struct(col("__ats"), col(rightTie))).as("__r"))
      .select(right.columns.toSeq.map(c =>
        if (keyCols.contains(c)) col(c)
        else col("__r").getField(c).as(c)): _*)
  }

  /** Incremental backward as-of — the log-ingest shape: a TIME-
    * PARTITIONED batch (every batch left at-or-after, and every batch
    * right STRICTLY after, the state's compaction point, per key —
    * enforced loudly on both sides; the right side is strict because a
    * batch right at exactly the state's timestamp could out-tie the
    * compacted row for lefts already shipped in earlier batches,
    * silently breaking the fold identity) joins
    * against (batch rights ∪ the carried one-row-per-key state), and the
    * new state is the latest right per key over the same union. Output ∪
    * over batches equals [[asofBackward]] over the full corpus EXACTLY
    * (q202's oracle is the full-corpus query verbatim — the hash match
    * IS the fold identity); state size is keys × one right row, never
    * proportional to history. */
  def asofBackwardIncremental(newLeft: DataFrame, newRight: DataFrame,
                              state: DataFrame, keyCols: Seq[String],
                              leftTs: Column, rightTs: Column,
                              rightTie: String,
                              toleranceUs: Option[Long] = None,
                              prefix: String = "asof_")
      : (DataFrame, DataFrame) = {
    val st = graft.CacheBarriers.barrier(state)
    val rightsAll = newRight.withColumn(StateCol, lit(false))
      .unionByName(st.withColumn(StateCol, lit(true)))
    val joined = asofBackward(newLeft, rightsAll, keyCols, leftTs, rightTs,
      rightTie, toleranceUs, prefix)
    // new state: latest right per key; a batch right older than the
    // state row violates the time-partition contract (the fold identity
    // would silently diverge) — raise on the consumed state path
    val payload = newRight.columns.toSeq.filterNot(keyCols.contains)
    val nextState = rightsAll
      .withColumn("__ats", rightTs.cast("long"))
      .filter(keyCols.map(col(_).isNotNull).reduce(_ && _) &&
        col("__ats").isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(
        max_by(struct(payload.map(col): _*),
          struct(col("__ats"), col(rightTie))).as("__r"),
        max(when(col(StateCol), col("__ats"))).as("__stts"),
        min(when(!col(StateCol), col("__ats"))).as("__minb"))
      .withColumn("__chk",
        when(col("__stts").isNotNull && col("__minb").isNotNull &&
          col("__minb") <= col("__stts"),
          raise_error(concat(
            lit("asof incremental: batch right at "),
            col("__minb").cast("string"),
            lit(" is at-or-before the compacted state at "),
            col("__stts").cast("string"),
            lit(" — batches must be time-partitioned per key, batch " +
              "rights strictly after the state"))))
          .otherwise(lit(1)))
      .filter(col("__chk") === 1)
      .select(newRight.columns.toSeq.map(c =>
        if (keyCols.contains(c)) col(c)
        else col("__r").getField(c).as(c)): _*)
    (joined, nextState)
  }

  /** Empty state for [[asofBackwardIncremental]]: a zero-row frame with
    * the right table's exact shape. */
  def emptyState(right: DataFrame): DataFrame = right.limit(0)
}
