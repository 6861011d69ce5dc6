package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) — the
  * OCCURRENCE-count member of the mergeable-sketch family: where the
  * register sketch ([[Cardinality]]) answers "how many DISTINCT keys"
  * and the quantile census ([[QuantileSketch]]) answers "what value sits
  * at rank r", the CMS answers point frequency queries — "how often does
  * THIS term occur in THAT slice" — from state whose size never depends
  * on the corpus or the vocabulary.
  *
  * Shape: a D×W integer table per group. Each occurrence of a key
  * increments one cell per row `r`: `c_r = ((A_r·h + B_r) mod P) mod W`
  * with `h` the [[TextHash.h32p]] base hash and `(A_r, B_r)` the FIRST D
  * coefficients of the minhash affine family ([[TextHash.A]]/[[TextHash.B]]
  * — one shared constant table across the whole sketch layer). The
  * census `(group…, r, c, n)` MERGES BY ADDITIVE SUM — associative and
  * commutative (the additive-census family: shard censuses, day folds,
  * batch appends), NOT idempotent (a replayed batch double-counts — the
  * delivery contract is the streaming layer's job, as with every
  * additive census here).
  *
  * Point estimate for key k: `min_r cms[r, c_r(k)]` — an OVERESTIMATE by
  * construction (cells only ever add): `exact ≤ est ≤ exact + εN` with
  * probability `1 − δ` for `W = ⌈e/ε⌉, D = ⌈ln 1/δ⌉`; the default
  * D=4, W=512 gives ε ≈ 0.53 % of the slice's total token mass at
  * δ ≈ 1.8 %. A probe absent from the slice CAN report 0 exactly (its
  * cells may still be empty) but never a negative. State per group is
  * ≤ D·W rows — config-sized, so like the register sketch it needs no
  * bucketed streaming form.
  *
  * ALL arithmetic is integer (`A_r·h < 2^62`, inside BIGINT on both
  * engines) and both sides emit from the same constants (the
  * [[TextHash]] discipline), so the DuckDB oracle reproduces every cell
  * and every estimate bit for bit.
  *
  * Reference framing: the reference engine keeps no frequency machinery —
  * term statistics ride the target store (`/root/reference/monstache.go`
  * delegates aggregation to Elasticsearch); this is the Spark-native
  * member the training-data pipeline needs (stopword discovery, probe
  * term QA, boilerplate frequency audits at 100 TB).
  */
object CountMin {
  /** Rows (independent hash functions): δ = e^−D ≈ 1.8 %. */
  val D = 4
  /** Columns per row: ε = e/W ≈ 0.53 % of slice token mass. */
  val W = 512

  require(D <= TextHash.K, "CMS rows reuse the minhash affine family")

  // ── Spark side ────────────────────────────────────────────────────────
  /** Row-r cell index of a base-hash column. */
  private def cell(r: Int, h: Column): Column =
    ((lit(TextHash.A(r)) * h + lit(TextHash.B(r))) % TextHash.P % W)
      .cast("long")

  /** Per-group CMS census `(group…, r, c, n)` over one key column —
    * a narrow map (D cells per occurrence) + an aggregate whose map-side
    * partial collapses every partition to ≤ D·W rows per group before
    * the shuffle. Null keys are dropped. */
  def census(keyed: DataFrame, key: Column,
             groupCols: Seq[String]): DataFrame = {
    val withH = keyed
      .select(groupCols.map(col) :+ TextHash.h32p(key).as("__h"): _*)
      .filter(col("__h").isNotNull)
    val cells = array((0 until D).map(r => cell(r, col("__h"))): _*)
    withH
      .select(groupCols.map(col) :+ posexplode(cells): _*)
      .withColumnRenamed("pos", "r")
      .withColumnRenamed("col", "c")
      .groupBy(groupCols.map(col) :+ col("r") :+ col("c"): _*)
      .agg(count(lit(1)).as("n"))
  }

  /** CMS census over document WORDS per group — the flagship use. */
  def wordCensus(docs: DataFrame, groupCol: String = "source",
                 textCol: String = "text"): DataFrame =
    census(
      docs.filter(col(textCol).isNotNull)
        .select(col(groupCol),
          explode(TextHash.words(col(textCol))).as("__w")),
      col("__w"), Seq(groupCol))

  /** Additive merge (shards, batches, days): sum per cell. */
  def merge(a: DataFrame, b: DataFrame, groupCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy(groupCols.map(col) :+ col("r") :+ col("c"): _*)
      .agg(sum(col("n")).as("n"))

  /** Point-frequency estimates for a probe-term frame `(term)` against
    * every group in the census: `(group…, term, est)` with
    * `est = min_r coalesce(n, 0)` — 0 only when some probed cell was
    * never touched (a guaranteed-absent term). Probes broadcast
    * everywhere (probe-set-sized); the join and the final min run over
    * census-sized frames, never the corpus. */
  def estimates(cms: DataFrame, probes: DataFrame,
                groupCols: Seq[String]): DataFrame = {
    val pcells = probes
      .select(col("term"), TextHash.h32p(col("term")).as("__h"))
      .filter(col("__h").isNotNull)
      .select(col("term"),
        posexplode(array((0 until D).map(r => cell(r, col("__h"))): _*)))
      .withColumnRenamed("pos", "r")
      .withColumnRenamed("col", "c")
    val groups = cms.select(groupCols.map(col): _*).distinct()
    groups
      .crossJoin(broadcast(pcells))
      .join(cms, groupCols ++ Seq("r", "c"), "left")
      .groupBy(groupCols.map(col) :+ col("term"): _*)
      .agg(min(coalesce(col("n"), lit(0L))).as("est"))
  }

  // ── DuckDB side (same constants, same integer math) ───────────────────
  /** VALUES list `(r, a, b)` of the D row coefficients. */
  private def sqlRowCoeffs: String =
    (0 until D).map(r => s"(${r}, ${TextHash.A(r)}, ${TextHash.B(r)})")
      .mkString(", ")

  /** CTEs `<p>cms(grp, r, c, n)` over a token CTE `<src>(grp, k)`. */
  def sqlCensusCtes(src: String, p: String = ""): String =
    s"""${p}h AS (SELECT grp, ${TextHash.sqlH32p("k")} AS h FROM $src),
       |${p}cms AS (
       |  SELECT grp, r, ((a * h + b) % ${TextHash.P}) % $W AS c,
       |         count(*) AS n
       |  FROM ${p}h, (VALUES $sqlRowCoeffs) AS __r(r, a, b)
       |  WHERE h IS NOT NULL GROUP BY 1, 2, 3)""".stripMargin

  /** CTE `<p>est(grp, term, est)` probing `<p>cms` with `<probes>(term)`
    * — the [[estimates]] twin (left join + min over coalesced cells). */
  def sqlEstimateCte(probes: String, p: String = ""): String =
    s"""${p}pc AS (
       |  SELECT term, r,
       |         ((a * ${TextHash.sqlH32p("term")} + b) % ${TextHash.P})
       |           % $W AS c
       |  FROM $probes, (VALUES $sqlRowCoeffs) AS __r(r, a, b)
       |  WHERE term IS NOT NULL),
       |${p}grp AS (SELECT DISTINCT grp FROM ${p}cms),
       |${p}est AS (
       |  SELECT g.grp, pc.term, min(coalesce(s.n, 0)) AS est
       |  FROM ${p}grp g CROSS JOIN ${p}pc pc
       |  LEFT JOIN ${p}cms s ON s.grp = g.grp AND s.r = pc.r AND s.c = pc.c
       |  GROUP BY 1, 2)""".stripMargin
}
