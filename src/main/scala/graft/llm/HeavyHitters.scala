package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Misra–Gries heavy-hitters summary (Misra & Gries, Sci. Comput.
  * Program. 1982) in its MERGEABLE form (Agarwal, Cormode, Huang,
  * Phillips, Wei & Yi, PODS 2012 "Mergeable Summaries" §3) — the
  * WHICH-keys member of the mergeable-sketch family: the register
  * sketch ([[Cardinality]]) answers "how many distinct keys", the CMS
  * ([[CountMin]]) answers "how often does THIS key occur" but must be
  * told which keys to probe, and the MG summary closes the loop by
  * NAMING the candidate heavy keys from state of fixed size k — no
  * vocabulary-sized artifact anywhere.
  *
  * Shape: per group, at most k `(term, n, err)` counter rows. A shard's
  * summary is its exact census COMPRESSED by [[truncate]]: rank counters
  * by `(n DESC, term ASC)`, subtract the (k+1)-th largest count from
  * every kept counter, drop the non-positive, and fold the subtracted
  * value into the group's `err`. [[merge]] is the PODS-2012 merge: add
  * the two counter tables key-wise, add the two `err`s, truncate again.
  * Both steps are deterministic (the total tie-break order), so a FIXED
  * merge tree over fixed shards is bit-reproducible on both engines —
  * the DuckDB oracle replays every truncation's rank window and
  * subtraction exactly ([[sqlCensusCte]]/[[sqlTruncateCtes]]/
  * [[sqlMergeCtes]] unroll the tree the way [[Bpe.sqlTrainCtes]] unrolls
  * merge rounds).
  *
  * Guarantees audited in the gate (q243), straight from the papers: for
  * every key x with true count c(x) and summary count n(x) (0 when
  * absent), `n(x) ≤ c(x) ≤ n(x) + err` — the summary UNDERestimates
  * (the CMS overestimates; together they bracket the truth, q244) — and
  * any x with `c(x) > err` is guaranteed to survive every merge. `err`
  * itself is bounded by N/(k+1) per merge step (each subtraction is at
  * most the mean of k+1 surviving counters).
  *
  * Scale shape: the census is a map-side-combining word count (the
  * [[CountMin.wordCensus]] shuffle); every summary after it is ≤ k rows
  * per group — merges, fold state, and the driver-side probe handoff to
  * [[CountMin.estimates]] all run on config-sized frames. At 100 TB the
  * per-shard census is the only corpus-scale stage, and it is exactly
  * the aggregation Spark already does best; the summaries are the bytes
  * that travel.
  *
  * Reference framing: the reference keeps no frequency machinery
  * (`/root/reference/monstache.go` delegates term stats to
  * Elasticsearch); this is the Spark-native candidate-discovery step a
  * stopword/boilerplate audit needs before probing.
  */
object HeavyHitters {
  /** Default summary capacity per group. */
  val KDefault = 8

  // ── Spark side ────────────────────────────────────────────────────────
  /** Per-group exact census `(group…, term, n, err=0)` of one key
    * column — the compression input. Null keys are dropped; the
    * aggregate's map-side partial keeps the shuffle vocabulary-sized,
    * never corpus-sized. */
  def census(keyed: DataFrame, key: Column,
             groupCols: Seq[String]): DataFrame =
    keyed
      .select(groupCols.map(col) :+ key.as("term"): _*)
      .filter(col("term").isNotNull)
      .groupBy(groupCols.map(col) :+ col("term"): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("err", lit(0L))

  /** Census over document WORDS per group — the flagship use. */
  def wordCensus(docs: DataFrame, groupCol: String = "source",
                 textCol: String = "text"): DataFrame =
    census(
      docs.filter(col(textCol).isNotNull)
        .select(col(groupCol),
          explode(TextHash.words(col(textCol))).as("__w")),
      col("__w"), Seq(groupCol))

  /** Compress a summary/census `(group…, term, n, err)` to ≤ k counters
    * per group: subtract the (k+1)-th largest count (ties broken
    * `term ASC` — total order, so both engines agree) from the top-k,
    * keep the strictly positive, add the subtraction to `err`. The rank
    * window runs over an already-aggregated frame (vocabulary-sized per
    * group at worst, k+k rows for a merge), never the corpus. */
  def truncate(summary: DataFrame, k: Int,
               groupCols: Seq[String]): DataFrame = {
    require(k >= 1, s"k=$k: an MG summary needs at least one counter")
    // join-free: the (k+1)-th count reaches every row through a second
    // window over the SAME partitioning — one exchange, no broadcast
    // job (summaries merge often; per-step fixed overhead compounds)
    val wOrd = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("n").desc, col("term").asc)
    val wAll = Window.partitionBy(groupCols.map(col): _*)
    summary
      .withColumn("__rk", row_number().over(wOrd))
      .withColumn("__sub", coalesce(
        max(when(col("__rk") === k + 1, col("n"))).over(wAll), lit(0L)))
      .filter(col("__rk") <= k && col("n") > col("__sub"))
      .select(groupCols.map(col)
        :+ col("term")
        :+ (col("n") - col("__sub")).as("n")
        :+ (col("err") + col("__sub")).as("err"): _*)
  }

  /** One-step summary of a keyed frame: census then truncate. */
  def summarize(keyed: DataFrame, key: Column, groupCols: Seq[String],
                k: Int = KDefault): DataFrame =
    truncate(census(keyed, key, groupCols), k, groupCols)

  /** PODS-2012 merge of two summaries: key-wise counter sum, group-wise
    * `err` sum, truncate. Counter tables are ≤ k rows per group per
    * side, so everything here is config-sized.
    *
    * Edge (stated, deterministic on both engines): a group whose
    * counters ALL died in a truncation (a uniform tie at the k+1
    * boundary — see the spec) has no rows, so its `err` leaves the
    * frame; callers needing a bound for such a group fall back to its
    * total mass N (err ≤ N by construction). */
  def merge(a: DataFrame, b: DataFrame, groupCols: Seq[String],
            k: Int = KDefault): DataFrame = {
    // join-free: tag each side, recover the two per-group errs through
    // a window over the union (err is constant per group per side by
    // construction), sum counters key-wise, truncate — two exchanges
    // total, no broadcast jobs
    def side(df: DataFrame, tag: Int) =
      df.select(groupCols.map(col) :+ col("term") :+ col("n")
        :+ col("err") :+ lit(tag).as("__side"): _*)
    val wg = Window.partitionBy(groupCols.map(col): _*)
    val summed = side(a, 0).unionByName(side(b, 1))
      .withColumn("__errt",
        coalesce(max(when(col("__side") === 0, col("err"))).over(wg),
          lit(0L)) +
          coalesce(max(when(col("__side") === 1, col("err"))).over(wg),
            lit(0L)))
      .groupBy(groupCols.map(col) :+ col("term"): _*)
      .agg(sum(col("n")).as("n"), max(col("__errt")).as("err"))
    truncate(summed, k, groupCols)
  }

  // ── DuckDB side (same rank order, same integer math) ──────────────────
  /** CTE `<out>(grp, term, n, err)` — the [[census]] twin over a token
    * CTE `<src>(grp, k)`. */
  def sqlCensusCte(src: String, out: String): String =
    s"""$out AS (
       |  SELECT grp, k AS term, count(*) AS n, 0 AS err
       |  FROM $src WHERE k IS NOT NULL GROUP BY 1, 2)""".stripMargin

  /** CTEs ending in `<out>(grp, term, n, err)` — the [[truncate]] twin
    * over `<src>(grp, term, n, err)`. */
  def sqlTruncateCtes(src: String, k: Int, out: String): String =
    s"""${out}rk AS (
       |  SELECT grp, term, n, err,
       |         row_number() OVER (PARTITION BY grp
       |           ORDER BY n DESC, term ASC) AS rk
       |  FROM $src),
       |${out}sb AS (
       |  SELECT grp,
       |         coalesce(max(CASE WHEN rk = ${k + 1} THEN n END), 0)
       |           AS sub
       |  FROM ${out}rk GROUP BY grp),
       |$out AS (
       |  SELECT r.grp, r.term, r.n - s.sub AS n, r.err + s.sub AS err
       |  FROM ${out}rk r JOIN ${out}sb s ON r.grp = s.grp
       |  WHERE r.rk <= $k AND r.n > s.sub)""".stripMargin

  /** CTEs ending in `<out>(grp, term, n, err)` — the [[merge]] twin over
    * summaries `<a>` and `<b>`. */
  def sqlMergeCtes(a: String, b: String, k: Int, out: String): String =
    s"""${out}un AS (
       |  SELECT grp, term, sum(n) AS n
       |  FROM (SELECT grp, term, n FROM $a
       |        UNION ALL SELECT grp, term, n FROM $b)
       |  GROUP BY 1, 2),
       |${out}er AS (
       |  SELECT grp, sum(err) AS err
       |  FROM (SELECT DISTINCT grp, err FROM $a
       |        UNION ALL SELECT DISTINCT grp, err FROM $b)
       |  GROUP BY 1),
       |${out}in AS (
       |  SELECT u.grp, u.term, u.n, e.err
       |  FROM ${out}un u JOIN ${out}er e ON u.grp = e.grp),
       |${sqlTruncateCtes(s"${out}in", k, out)}""".stripMargin
}
