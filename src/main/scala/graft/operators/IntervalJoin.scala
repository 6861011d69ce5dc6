package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-containment join — every (point, interval) pair where the
  * point's timestamp falls inside the interval, per key, intervals free
  * to OVERLAP (each containing interval yields a row). The general form
  * of the time-attribution joins a pipeline needs where [[AsofJoin]]'s
  * latest-one-wins doesn't apply: attribute a diagnostic event to every
  * session whose grace window covers it, a sample to every experiment
  * window it ran under.
  *
  * NOT an inequality join under the hood: Spark plans `p.ts BETWEEN s AND
  * e` as a broadcast-nested-loop (or worse, a cartesian) — quadratic the
  * moment neither side broadcasts. Instead both sides discretize onto a
  * fixed time grid: an interval explodes into the bins it covers, a point
  * maps to its one bin, and the join is a plain EQUI-join on (key, bin) +
  * a residual containment filter — shuffle-partitioned, AQE-skew-
  * splittable, never quadratic. A point's bin meets each covering
  * interval exactly once, so no dedup pass is needed.
  *
  * Choosing `binUs`: near the typical interval length. Bins too fine
  * explode intervals into many rows (bounded loudly by
  * `maxBinsPerInterval` — a misconfigured grid fails, never silently
  * builds a 10⁶-row blowup per interval); bins too coarse put many
  * intervals in one bin and the residual filter does the work.
  *
  * Join semantics are INNER: a point inside no interval (and any point or
  * interval with a NULL key/timestamp) yields nothing — the outer form is
  * a left anti-join the caller composes when absence is the signal.
  * Bounds are both INCLUSIVE ([start_us, end_us] — session endpoints are
  * event instants, and an event AT the boundary is inside).
  */
object IntervalJoin {

  /** The grid cell containing `x`, as the cell's own start value — exact
    * all-long arithmetic, negative-safe (a plain `x div b` truncates
    * toward zero, splitting the grid at 0; a double division loses
    * exactness past 2^53, i.e. for nano-scale stamps). */
  private def gridCell(x: Column, b: Long): Column =
    x - ((x % b + b) % b)

  /** Containment join: every point column survives, plus `ts_us` (the
    * point timestamp in BIGINT micros), plus each non-key interval
    * column as `<prefix><name>`. One output row per containing
    * interval. */
  def byContainment(points: DataFrame, intervals: DataFrame,
                    keyCols: Seq[String], pointTs: Column,
                    startTs: Column, endTs: Column, binUs: Long,
                    maxBinsPerInterval: Int = 4096,
                    prefix: String = "iv_"): DataFrame = {
    require(keyCols.nonEmpty, "interval join needs at least one key column")
    require(binUs > 0, s"binUs=$binUs: the grid needs a positive pitch")
    require(maxBinsPerInterval > 0, "maxBinsPerInterval must be positive")
    val payload = intervals.columns.toSeq.filterNot(keyCols.contains)
    val reserved = payload.map(prefix + _) :+ "ts_us"
    val clash = points.columns.toSeq.intersect(reserved)
    require(clash.isEmpty, s"point columns ${clash.mkString(", ")} collide " +
      "with the interval-join output — rename or change prefix")

    val iv = intervals
      .withColumn("__s", startTs.cast("long"))
      .withColumn("__e", endTs.cast("long"))
      .filter(keyCols.map(col(_).isNotNull).reduce(_ && _) &&
        col("__s").isNotNull && col("__e").isNotNull)
      .withColumn("__b0", gridCell(col("__s"), binUs))
      .withColumn("__b1", gridCell(col("__e"), binUs))
      // fail loudly, BEFORE the sequence materializes: an inverted
      // interval or a grid three orders too fine is a config bug
      .withColumn("__bins",
        when(col("__e") < col("__s"), raise_error(concat(
          lit("intervalJoin: inverted interval ["),
          col("__s").cast("string"), lit(", "),
          col("__e").cast("string"), lit("]"))))
          .when(col("__b1") - col("__b0") >=
            maxBinsPerInterval.toLong * binUs,
            raise_error(concat(
              lit("intervalJoin: interval ["), col("__s").cast("string"),
              lit(", "), col("__e").cast("string"),
              lit(s") covers more than $maxBinsPerInterval bins of "),
              lit(binUs), lit("us — coarsen binUs"))))
          .otherwise(sequence(col("__b0"), col("__b1"), lit(binUs))))
      .withColumn("__bin", explode(col("__bins")))
      .select(keyCols.map(col) ++ Seq(col("__bin"), col("__s"), col("__e")) ++
        payload.map(c => col(c).as(prefix + c)): _*)

    val pt = points
      .withColumn("ts_us", pointTs.cast("long"))
      .filter(keyCols.map(col(_).isNotNull).reduce(_ && _) &&
        col("ts_us").isNotNull)
      .withColumn("__bin", gridCell(col("ts_us"), binUs))

    pt.join(iv, keyCols :+ "__bin")
      .filter(col("ts_us") >= col("__s") && col("ts_us") <= col("__e"))
      .drop("__bin", "__s", "__e")
  }
}
