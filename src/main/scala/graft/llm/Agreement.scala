package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inter-annotator agreement for preference/label QA — the step a
  * reward-model data pipeline runs BEFORE trusting its labels
  * (Artstein & Poesio, Comput. Linguist. 2008): how often do two
  * judges agree beyond chance? Cohen's kappa per judge pair, computed
  * entirely in INTEGER micro fixed-point so the DuckDB oracle replays
  * every observed-agreement share, every chance-agreement term, and
  * every truncation ([[sqlKappaCtes]]).
  *
  * Semantics (stated): labels are categorical (any string); only items
  * BOTH judges labeled enter a pair's table (pairwise-complete, the
  * standard treatment for sparse assignment); `po_micro` is the
  * agreement share ·10^6 DIV n, `pe_micro` is Σ_c (n_a(c)·n_b(c))
  * ·10^6 DIV n², and `kappa_micro = (po−pe)·10^6 DIV (10^6−pe)` —
  * NULL when pe = 10^6 (a degenerate single-category pair, where
  * kappa is undefined; both engines emit NULL).
  *
  * Scale shape: one shuffle on the item key joins each judge pair's
  * labels (judges are config-sized, so the pair fan-out is bounded);
  * everything after is per-(pair, category) census arithmetic —
  * censuses, not items, travel. */
object Agreement {

  /** Per-judge-pair Cohen's kappa over `(item, judge, label)` rows:
    * `(judge_a, judge_b, n, po_micro, pe_micro, kappa_micro)` for
    * every unordered pair `judge_a < judge_b` with ≥ 1 shared item. */
  def cohenKappa(labels: DataFrame, itemCol: String = "item",
                 judgeCol: String = "judge",
                 labelCol: String = "label"): DataFrame = {
    val l = labels.select(col(itemCol).as("__it"),
      col(judgeCol).as("__ju"), col(labelCol).as("__la"))
      .filter(col("__it").isNotNull && col("__ju").isNotNull &&
        col("__la").isNotNull)
    val joined = l.alias("a").join(l.alias("b"),
      col("a.__it") === col("b.__it") && col("a.__ju") < col("b.__ju"))
      .select(col("a.__ju").as("judge_a"), col("b.__ju").as("judge_b"),
        col("a.__la").as("la"), col("b.__la").as("lb"))
    val counts = joined.groupBy(col("judge_a"), col("judge_b"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("la") === col("lb"), 1L).otherwise(0L)).as("agree"))
    // per-category marginals of each side, joined back per pair
    val marg = joined
      .select(col("judge_a"), col("judge_b"),
        explode(array(
          struct(lit(0).as("side"), col("la").as("cat")),
          struct(lit(1).as("side"), col("lb").as("cat")))).as("m"))
      .groupBy(col("judge_a"), col("judge_b"), col("m.cat"))
      .agg(sum(when(col("m.side") === 0, 1L).otherwise(0L)).as("na"),
        sum(when(col("m.side") === 1, 1L).otherwise(0L)).as("nb"))
      .groupBy(col("judge_a"), col("judge_b"))
      .agg(sum(col("na") * col("nb")).as("pesum"))
    counts.join(marg, Seq("judge_a", "judge_b"))
      .withColumn("po_micro", expr("agree * 1000000L DIV n"))
      .withColumn("pe_micro", expr("pesum * 1000000L DIV (n * n)"))
      .withColumn("kappa_micro",
        when(col("pe_micro") === 1000000L, lit(null).cast("long"))
          .otherwise(expr(
            "(po_micro - pe_micro) * 1000000L DIV (1000000L - pe_micro)")))
      .select(col("judge_a"), col("judge_b"), col("n"), col("po_micro"),
        col("pe_micro"), col("kappa_micro"))
  }

  // ── DuckDB side (same integer math) ───────────────────────────────────
  /** CTEs ending in `<out>(judge_a, judge_b, n, po_micro, pe_micro,
    * kappa_micro)` over `<src>(item, judge, label)`. */
  def sqlKappaCtes(src: String, out: String): String =
    s"""${out}j AS (
       |  SELECT a.judge AS judge_a, b.judge AS judge_b,
       |         a.label AS la, b.label AS lb
       |  FROM $src a JOIN $src b
       |    ON a.item = b.item AND a.judge < b.judge),
       |${out}c AS (
       |  SELECT judge_a, judge_b, count(*) AS n,
       |         sum(CASE WHEN la = lb THEN 1 ELSE 0 END) AS agree
       |  FROM ${out}j GROUP BY 1, 2),
       |${out}m AS (
       |  SELECT judge_a, judge_b, cat, sum(na) AS na, sum(nb) AS nb
       |  FROM (
       |    SELECT judge_a, judge_b, la AS cat, 1 AS na, 0 AS nb
       |    FROM ${out}j
       |    UNION ALL
       |    SELECT judge_a, judge_b, lb, 0, 1 FROM ${out}j)
       |  GROUP BY 1, 2, 3),
       |${out}p AS (
       |  SELECT judge_a, judge_b, sum(na * nb) AS pesum
       |  FROM ${out}m GROUP BY 1, 2),
       |$out AS (
       |  SELECT c.judge_a, c.judge_b, c.n,
       |         (c.agree * 1000000) // c.n AS po_micro,
       |         (p.pesum * 1000000) // (c.n * c.n) AS pe_micro,
       |         CASE WHEN (p.pesum * 1000000) // (c.n * c.n) = 1000000
       |              THEN NULL
       |              ELSE ((c.agree * 1000000) // c.n
       |                    - (p.pesum * 1000000) // (c.n * c.n))
       |                   * 1000000
       |                   // (1000000
       |                      - (p.pesum * 1000000) // (c.n * c.n)) END
       |           AS kappa_micro
       |  FROM ${out}c c
       |  JOIN ${out}p p
       |    ON c.judge_a = p.judge_a AND c.judge_b = p.judge_b)"""
      .stripMargin
}
