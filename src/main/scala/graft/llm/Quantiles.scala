package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-source quantile bucketing WITHOUT a global sort — the order
  * statistic a quality-based mixing pipeline needs (length curricula,
  * per-source quality deciles, DCLM-style threshold selection) in a
  * shape that survives 100 TB.
  *
  * The classic form (`ntile() OVER (PARTITION BY source ORDER BY
  * score)`) total-orders every partition: one shuffle carrying every
  * row into per-source sort buckets, with the biggest source as the
  * straggler — at corpus scale that is THE anti-pattern the engine's
  * other operators avoid (see the bounded-heap top-k note). Here order
  * statistics come from an integer HISTOGRAM instead:
  *
  *  1. [[scoreHistogram]] — one map-side-combined aggregation to
  *     (source, bin, n): histogram-sized output (sources × bins), and
  *     ADDITIVE — two batches' histograms merge by per-key addition
  *     ([[mergeHistograms]]) into exactly the union's histogram, so the
  *     artifact rolls forward run over run like the curation censuses.
  *  2. [[binThresholds]] — per-source k-quantile bin edges from the
  *     cumulative histogram. The window here runs over HISTOGRAM rows,
  *     not corpus rows — control-plane-sized by construction.
  *  3. [[withQuantileBucket]] — decorate the corpus by broadcast-joining
  *     the per-source edge array and counting edges below the row's
  *     bin: one narrow codegen'd pass, zero corpus shuffle.
  *
  * The trade vs `ntile` is bin granularity: rows inside one bin are not
  * ordered, so bucket boundaries land on bin edges (quantile error ≤
  * one bin's width of score mass). For curation scores — bounded
  * integers with natural widths — that is the right trade; exact
  * per-row ranks are never needed to decide "top half by length per
  * source".
  *
  * Everything is integer arithmetic on both engines (bins, cumulative
  * counts, ceil via `(q*total + k - 1) div k`), so the DuckDB oracle
  * replays bit-identically. */
object Quantiles {

  /** (source, bin, n): count per integer score bin per source. Additive:
    * long counts merge by addition. A NULL score quarantines into bin
    * NULL (kept, so corpus counts reconcile; threshold derivation and
    * bucketing skip it). */
  def scoreHistogram(docs: DataFrame, scoreCol: Column, binWidth: Long,
                     sourceCol: String = "source"): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    docs.groupBy(col(sourceCol),
        floor(scoreCol / lit(binWidth)).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"))
  }

  /** Fold a new batch's histogram into a persisted artifact — pure
    * addition on the (source, bin) key. */
  def mergeHistograms(a: DataFrame, b: DataFrame,
                      sourceCol: String = "source"): DataFrame =
    a.unionByName(b)
      .groupBy(col(sourceCol), col("bin"))
      .agg(sum(col("n")).as("n"))

  /** Per-source quantile bin edges: for q = 1..k-1, the smallest bin
    * whose cumulative count reaches `ceil(q·total/k)` — one row per
    * source with the ascending edge array. The window ordering runs
    * over histogram rows only (sources × bins — control-plane-sized;
    * the corpus never re-enters). */
  def binThresholds(hist: DataFrame, k: Int,
                    sourceCol: String = "source"): DataFrame = {
    require(k >= 2, s"k must be at least 2, got $k")
    val w = Window.partitionBy(col(sourceCol)).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.filter(col("bin").isNotNull)
      .withColumn("cum", sum(col("n")).over(w))
      .withColumn("total",
        sum(col("n")).over(Window.partitionBy(col(sourceCol))))
    // bin b is the q-th edge iff it is the FIRST bin with
    // cum >= ceil(q·total/k); (cum - n) < target expresses "first"
    // without a second window pass
    val qs = cum.crossJoin(
      spark_range(hist.sparkSession, 1, k.toLong))
      .withColumn("target",
        // integer ceil(q·total/k) via floor((q·total + k-1)/k). The
        // division is double (Spark `/` always is), but q·total ≤
        // 9·|corpus| sits far inside 2^53 and a true m/k value is never
        // within an ulp of a different integer, so the floor is exact —
        // and identical to the oracle's same expression
        floor((col("q") * col("total") + lit(k.toLong - 1)) /
          lit(k.toDouble)).cast("long"))
      .filter(col("cum") >= col("target") &&
        (col("cum") - col("n")) < col("target"))
    qs.groupBy(col(sourceCol))
      .agg(transform(
        array_sort(collect_list(struct(col("q"), col("bin")))),
        x => x.getField("bin")).as("edges"))
  }

  private def spark_range(spark: org.apache.spark.sql.SparkSession,
                          from: Long, until: Long): DataFrame =
    spark.range(from, until).select(col("id").as("q"))

  /** Decorate each doc with its per-source quantile bucket in 1..k:
    * bucket = 1 + number of edges strictly below the doc's bin. One
    * broadcast join on the source plus a narrow array fold — no corpus
    * shuffle, no sort. Rows with a NULL score are absent (the
    * [[scoreHistogram]] quarantine contract); a doc whose SOURCE has no
    * thresholds row (a source the histogram artifact has never seen —
    * the incremental-flow hazard — or one whose scores were all NULL)
    * keeps its row with a NULL `q_bucket`: visibly unbucketed, never
    * silently dropped. Callers that treat an unknown source as a wiring
    * error assert `q_bucket.isNotNull`. */
  def withQuantileBucket(docs: DataFrame, thresholds: DataFrame,
                         scoreCol: Column, binWidth: Long,
                         sourceCol: String = "source"): DataFrame =
    docs.withColumn("bin", floor(scoreCol / lit(binWidth)).cast("long"))
      .filter(col("bin").isNotNull)
      .join(broadcast(thresholds), Seq(sourceCol), "left")
      .withColumn("q_bucket",
        // The NULL branch is explicit rather than relying on size(NULL)
        // propagating NULL: under spark.sql.legacy.sizeOfNull=true (the
        // non-ANSI default on a vanilla session) size(NULL) is -1, which
        // would silently turn "unknown source" into bucket 0 and defeat
        // the callers' isNotNull wiring assertion. GraftSession sets the
        // flag, but the operator's contract must not depend on it.
        when(col("edges").isNull, lit(null).cast("long"))
          .otherwise((lit(1) +
            size(filter(col("edges"), e => e < col("bin")))).cast("long")))
      .drop("edges")
}
