package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable quantile sketch over non-negative integer measures — the
  * companion to [[Cardinality]] (distinct counts) for the other census
  * the 100 TB pipeline keeps asking for: "what are the p50/p90/p99 of
  * doc length / token count / dup-span size per slice" without a
  * corpus-wide sort.
  *
  * Shape: an HdrHistogram-style exponential histogram (Tene's
  * HdrHistogram; same regime as DDSketch, Masson et al., VLDB 2019 —
  * both public designs). Values bucket into
  *
  *   - an EXACT regime: `x < 32` → `code = x` (small measures are
  *     stored losslessly);
  *   - a LOG regime: for `x ≥ 32` with `e = ⌊log2 x⌋`,
  *     `code = 32·(e−5) + ⌊x·32 / 2^e⌋` — 32 linear sub-buckets per
  *     octave, so every bucket's width is ≤ 1/32 of its lower bound
  *     (≤ 3.125 % relative error, one-sided: the estimate is the
  *     bucket's LOWER bound, so `est ≤ exact < est·(1 + 1/32)`).
  *
  * Codes are monotone in `x` and contiguous across octaves (the last
  * sub-bucket of octave e abuts the first of e+1), so rank selection
  * over the bucket census IS quantile selection over the values.
  *
  * The census `(group…, code, n)` MERGES BY ADDITIVE SUM — associative
  * and commutative, the additive-census family ([[Features]] df census,
  * not the idempotent register family of [[Cardinality]]): shard
  * censuses, day folds, and batch appends all combine without reading
  * the corpus again. State per group is ≤ 32 + 32·(bits(max)−4) rows —
  * a few hundred for any realistic measure — so like the register
  * sketch it needs no bucketed streaming form: the artifact is
  * config-sized by construction.
  *
  * ALL arithmetic is integer-exact and emitted twice from the same
  * constants (the [[TextHash]] discipline): `⌊log2 x⌋` is the length of
  * the binary digit string minus one (`conv(x,10,2)` on Spark,
  * `bin(x)` on DuckDB — both render without leading zeros), `2^e` is
  * `CAST(pow(2,e) AS BIGINT)` (exact for e ≤ 52 on both engines), and
  * rank targets use the shared ceiling `⌊(pct·N + 99) / 100⌋`. No
  * floating point can flip a bucket cross-engine.
  *
  * Reference framing: the reference engine keeps no quantile machinery —
  * its percentiles ride the target store's aggregations
  * (`/root/reference/monstache.go` delegates stats to Elasticsearch);
  * this is the Spark-native member the training-data pipeline needs.
  */
object QuantileSketch {
  /** Sub-buckets per octave (2^5); also the exact-regime bound. */
  val B = 32

  // ── shared integer bucket algebra, emitted per engine ────────────────
  /** Engine-neutral bucket code for `x ≥ 0`; `binLen` renders the
    * engine's binary-digit-string length, `div` its integer division. */
  private def codeCase(x: String, binLen: String, div: String): String =
    s"CASE WHEN $x < $B THEN $x ELSE $B * (($binLen) - 6)" +
      s" + (($x * $B) $div CAST(pow(2, ($binLen) - 1) AS BIGINT)) END"

  /** Bucket lower bound from a code (the estimate representative). */
  private def loCase(c: String, div: String): String =
    s"CASE WHEN $c < $B THEN $c ELSE ($c % $B + $B)" +
      s" * CAST(pow(2, ($c $div $B) - 1) AS BIGINT) END"

  /** Spark-side bucket code of a non-negative BIGINT expression. */
  def sparkCode(x: String): String =
    codeCase(x, s"length(conv(CAST($x AS STRING), 10, 2))", "DIV")

  /** Spark-side bucket lower bound of a code expression. */
  def sparkLo(c: String): String = loCase(c, "DIV")

  /** DuckDB-side bucket code (for oracle CTEs). */
  def sqlCode(x: String): String =
    codeCase(x, s"length(bin(CAST($x AS BIGINT)))", "//")

  /** DuckDB-side bucket lower bound. */
  def sqlLo(c: String): String = loCase(c, "//")

  // ── Spark side ───────────────────────────────────────────────────────
  /** Per-group bucket census `(group…, code, n)` over one non-negative
    * integer measure — a narrow map + an aggregate whose map-side
    * partial collapses each partition to census size before the
    * shuffle. Null / negative measures are dropped (documented
    * contract: quantiles of a non-negative measure). */
  def census(df: DataFrame, value: Column, groupCols: Seq[String]): DataFrame =
    df.select(groupCols.map(col) :+ value.cast("long").as("__x"): _*)
      .filter(col("__x").isNotNull && col("__x") >= 0)
      .withColumn("code", expr(sparkCode("__x")))
      .groupBy(groupCols.map(col) :+ col("code"): _*)
      .agg(count(lit(1)).as("n"))

  /** Additive merge of two censuses (shards, batches, days). */
  def merge(a: DataFrame, b: DataFrame, groupCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy(groupCols.map(col) :+ col("code"): _*)
      .agg(sum(col("n")).as("n"))

  /** Rank-select the requested percentiles from any `(group…, code, n)`
    * census: target rank `r = max(1, ⌈pct·N/100⌉)`, estimate = decode of
    * the smallest code whose cumulative count reaches r. The window and
    * join run over the CENSUS (config-sized per group), never the
    * corpus. `decode` maps the elected code to the reported value —
    * [[sparkLo]] for the sketch census, identity for an exact
    * value census. */
  def quantilesFromCensus(cen: DataFrame, groupCols: Seq[String],
                          pcts: Seq[Int], decode: String => String,
                          outCol: String): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      s"quantilesFromCensus: pcts=$pcts")
    val spark = cen.sparkSession
    import spark.implicits._
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("code"))
    val cum = cen.withColumn("__cum", sum(col("n")).over(w))
    val tot = cen.groupBy(groupCols.map(col): _*).agg(sum(col("n")).as("__N"))
    val targets = tot
      .crossJoin(broadcast(pcts.toDF("pct")))
      .withColumn("__r",
        greatest(expr("(pct * __N + 99) DIV 100"), lit(1L)))
      .select(groupCols.map(col) :+ col("pct") :+ col("__r"): _*)
    targets.join(cum, groupCols)
      .filter(col("__cum") >= col("__r"))
      .groupBy(groupCols.map(col) :+ col("pct"): _*)
      .agg(min(col("code")).as("__code"))
      .withColumn(outCol, expr(decode("__code")))
      .select(groupCols.map(col) :+ col("pct") :+ col(outCol): _*)
  }

  /** Sketch-estimated percentiles: census → rank-select → bucket lower
    * bound. */
  def estimates(cen: DataFrame, groupCols: Seq[String],
                pcts: Seq[Int]): DataFrame =
    quantilesFromCensus(cen, groupCols, pcts, sparkLo, "est")

  /** Exact percentiles via a DISTINCT-VALUE census (value → count) —
    * the audit comparison. Cumulative selection runs over distinct
    * measure values (≪ corpus for any bounded measure), the same
    * census discipline with identity coding. */
  def exactQuantiles(df: DataFrame, value: Column, groupCols: Seq[String],
                     pcts: Seq[Int]): DataFrame = {
    val cen = df
      .select(groupCols.map(col) :+ value.cast("long").as("code"): _*)
      .filter(col("code").isNotNull && col("code") >= 0)
      .groupBy(groupCols.map(col) :+ col("code"): _*)
      .agg(count(lit(1)).as("n"))
    quantilesFromCensus(cen, groupCols, pcts, identity, "exact")
  }

  /** Distribution drift between two censuses of the SAME measure (two
    * snapshots, two slices): a total-variation-style distance
    *
    *   `drift_micro = (Σ_code |⌊n_a·10⁶/N_a⌋ − ⌊n_b·10⁶/N_b⌋|) DIV 2`
    *
    * per group — 0 for identical shapes, ≤ 10⁶ for disjoint ones. The
    * per-side micro-fractions are floored BEFORE the difference, so the
    * statistic is integer-deterministic on both engines by definition
    * (the floor error is bounded by the census size · 1e-6 and
    * identical cross-engine). The full-outer bucket join and the sum
    * run over census-sized frames only. Headroom: `n·10⁶` must fit
    * BIGINT — fine below ~9·10¹² rows per group. */
  def censusDistance(a: DataFrame, b: DataFrame,
                     groupCols: Seq[String]): DataFrame = {
    def sided(df: DataFrame, tag: String): DataFrame = {
      val tot = df.groupBy(groupCols.map(col): _*)
        .agg(sum(col("n")).as(s"__N$tag"))
      df.join(tot, groupCols)
        .withColumn(s"__p$tag",
          expr(s"n * 1000000L DIV __N$tag"))
        .select(groupCols.map(col) :+ col("code") :+
          col(s"__p$tag") :+ col(s"__N$tag"): _*)
    }
    sided(a, "a")
      .join(sided(b, "b"), groupCols :+ "code", "full_outer")
      .groupBy(groupCols.map(col): _*)
      .agg(
        max(col("__Na")).as("n_a"), max(col("__Nb")).as("n_b"),
        sum(abs(coalesce(col("__pa"), lit(0L)) -
          coalesce(col("__pb"), lit(0L)))).as("__s"))
      .withColumn("drift_micro", expr("__s DIV 2"))
      .select(groupCols.map(col) :+ col("n_a") :+ col("n_b") :+
        col("drift_micro"): _*)
  }

  // ── oracle side ──────────────────────────────────────────────────────
  /** CTEs `<p>est(grp, pct, est)` replaying census → merge → rank-select
    * → lower-bound decode over `src(grp, x)`; `pcts` must match the
    * Spark call. */
  def sqlEstimateCtes(src: String, pcts: Seq[Int], p: String = "qs"): String = {
    val vals = pcts.map(v => s"($v)").mkString(", ")
    s"""${p}cen AS (
       |  SELECT grp, ${sqlCode("x")} AS code, count(*) AS n
       |  FROM $src WHERE x IS NOT NULL AND x >= 0 GROUP BY 1, 2),
       |${p}tot AS (SELECT grp, sum(n) AS nn FROM ${p}cen GROUP BY 1),
       |${p}cum AS (
       |  SELECT grp, code,
       |         sum(n) OVER (PARTITION BY grp ORDER BY code) AS cum
       |  FROM ${p}cen),
       |${p}tgt AS (
       |  SELECT grp, pct, greatest((pct * nn + 99) // 100, 1) AS r
       |  FROM ${p}tot, (VALUES $vals) AS __p(pct)),
       |${p}sel AS (
       |  SELECT t.grp, t.pct, min(c.code) AS mcode
       |  FROM ${p}tgt t JOIN ${p}cum c ON t.grp = c.grp AND c.cum >= t.r
       |  GROUP BY 1, 2),
       |${p}est AS (
       |  SELECT grp, pct, CAST(${sqlLo("mcode")} AS BIGINT) AS est
       |  FROM ${p}sel)""".stripMargin
  }

  /** CTE `<p>drift(grp, n_a, n_b, drift_micro)` — the [[censusDistance]]
    * twin over two value CTEs `<srcA>(grp, x)` / `<srcB>(grp, x)`:
    * census each side, floor per-side micro-fractions, half-L1 over the
    * full-outer bucket join. */
  def sqlDriftCtes(srcA: String, srcB: String, p: String = "qd"): String = {
    def side(src: String, t: String): String =
      s"""${p}c$t AS (
         |  SELECT grp, ${sqlCode("x")} AS code, count(*) AS n
         |  FROM $src WHERE x IS NOT NULL AND x >= 0 GROUP BY 1, 2),
         |${p}s$t AS (
         |  SELECT grp, code, n * 1000000 // sum(n) OVER (PARTITION BY grp) AS p,
         |         sum(n) OVER (PARTITION BY grp) AS nn
         |  FROM ${p}c$t)""".stripMargin
    s"""${side(srcA, "a")},
       |${side(srcB, "b")},
       |${p}drift AS (
       |  SELECT coalesce(a.grp, b.grp) AS grp,
       |         CAST(max(a.nn) AS BIGINT) AS n_a,
       |         CAST(max(b.nn) AS BIGINT) AS n_b,
       |         CAST(sum(abs(coalesce(a.p, 0) - coalesce(b.p, 0))) // 2
       |              AS BIGINT) AS drift_micro
       |  FROM ${p}sa a FULL OUTER JOIN ${p}sb b
       |    ON a.grp = b.grp AND a.code = b.code
       |  GROUP BY 1)""".stripMargin
  }

  /** CTEs `<p>ex(grp, pct, exact)` — the exact rank-select over a
    * distinct-value census of the same source. */
  def sqlExactCtes(src: String, pcts: Seq[Int], p: String = "qe"): String = {
    val vals = pcts.map(v => s"($v)").mkString(", ")
    s"""${p}cen AS (
       |  SELECT grp, CAST(x AS BIGINT) AS code, count(*) AS n
       |  FROM $src WHERE x IS NOT NULL AND x >= 0 GROUP BY 1, 2),
       |${p}tot AS (SELECT grp, sum(n) AS nn FROM ${p}cen GROUP BY 1),
       |${p}cum AS (
       |  SELECT grp, code,
       |         sum(n) OVER (PARTITION BY grp ORDER BY code) AS cum
       |  FROM ${p}cen),
       |${p}tgt AS (
       |  SELECT grp, pct, greatest((pct * nn + 99) // 100, 1) AS r
       |  FROM ${p}tot, (VALUES $vals) AS __p(pct)),
       |${p}ex AS (
       |  SELECT t.grp, t.pct, CAST(min(c.code) AS BIGINT) AS exact
       |  FROM ${p}tgt t JOIN ${p}cum c ON t.grp = c.grp AND c.cum >= t.r
       |  GROUP BY 1, 2)""".stripMargin
  }
}
