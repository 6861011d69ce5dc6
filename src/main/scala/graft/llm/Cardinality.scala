package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches (HyperLogLog-style registers) — the
  * 100 TB answer to "how many distinct words/grams/users does each slice
  * of the corpus have" when an exact `count(DISTINCT …)` would shuffle
  * every distinct key to one aggregation:
  *
  *   - each shard/batch reduces its keys to a fixed M=256-register table
  *     per group (register = max leading-rank seen in that bucket);
  *   - register tables MERGE BY COMPONENTWISE MAX — associative,
  *     commutative, IDEMPOTENT, so shard unions, day folds, and replayed
  *     batches all combine without coordination (max absorbs replays for
  *     free, a strictly stronger property than the additive censuses);
  *   - the estimate is derived from the merged registers alone — the
  *     corpus is never re-read.
  *
  * All math is INTEGER-EXACT and emitted twice from the same constants
  * (the [[TextHash]] discipline), so the DuckDB oracle reproduces the
  * estimate bit for bit — no floating point anywhere on either engine:
  *
  *   - base hash [[TextHash.h32p]] (md5-prefix mod P, 31 bits);
  *   - bucket = h mod M; remainder z = h div M (23 bits);
  *   - rank rho(z) = index of lowest set bit + 1, computed as
  *     `bit_count((z & -z) - 1) + 1` (z & -z isolates the lowest set
  *     bit; a power of two minus one has exactly its exponent bits set —
  *     pure integer, both engines), capped at RMAX=24 when z = 0;
  *   - the harmonic sum S = Σ_b 2^(RMAX − reg_b) is an exact BIGINT
  *     (≤ M·2^RMAX = 2^32), empty buckets contributing 2^RMAX;
  *   - raw estimate (micro-scaled) = AlphaMicro·M²·2^RMAX DIV S
  *     (≈ 7.9·10^17, inside signed 64-bit);
  *   - the small-range linear-counting correction M·ln(M/V) is a LOOKUP
  *     into a 255-entry integer table precomputed HERE and emitted into
  *     both engines as literals — the one `ln` in the family runs at
  *     build time, never at query time, so it cannot flip cross-engine.
  *
  * Accuracy: the standard HLL bound, ~1.04/√M ≈ 6.5 % relative error at
  * M = 256 (the register table is deliberately small because it is a
  * per-group artifact; raise [[LogM]] for tighter bounds). The 31-bit
  * base hash saturates near 2^31 distinct keys per group — documented
  * headroom, not a correctness cliff (at that cardinality raise the hash
  * width with the same structure). No bucketed streaming form is needed:
  * the state is ≤ M rows per group — config-sized, the "census stays
  * global" regime of [[graft.streaming.StreamingPathCensus]].
  *
  * Reference framing: the reference engine has no sketch layer — its
  * distinct counting rides the target store's aggregations
  * (`/root/reference/monstache.go` delegates counts to Elasticsearch);
  * this is the Spark-native member the training-data pipeline needs.
  */
object Cardinality {
  /** log2(M): registers per group. */
  val LogM = 8
  val M: Int = 1 << LogM // 256
  /** Max rank: 31-bit hash minus LogM bucket bits, plus one. */
  val RMAX: Int = 31 - LogM + 1 // 24

  /** round(0.7213/(1 + 1.079/M) · 1e6) for M = 256 — the HLL bias
    * constant, micro-scaled; asserted against the closed form in
    * CardinalitySpec so the hardcoded literal cannot drift. */
  val AlphaMicro = 718273L

  /** Linear-counting table: LcMicro(V-1) = ⌊M·ln(M/V)·1e6⌋ for V =
    * 1 … M−1 zero registers. Computed once here, emitted to both engines
    * as integer literals. */
  val LcMicro: IndexedSeq[Long] =
    (1 until M).map(v => math.floor(M.toDouble * math.log(M.toDouble / v) * 1e6).toLong)

  /** Raw-vs-linear-counting switch point, micro-scaled: 2.5·M·1e6. */
  val LcCutMicro: Long = 5L * M * 1000000L / 2

  // ── Spark side ────────────────────────────────────────────────────────
  /** Per-group register table over one key column: (group…, bucket, reg).
    * Narrow map + a ≤ M·|groups|-group aggregate — the map-side partial
    * max collapses the shuffle to register-table size regardless of how
    * many keys feed it. */
  def registerSketch(keyed: DataFrame, key: Column,
                     groupCols: Seq[String]): DataFrame = {
    val h = TextHash.h32p(key)
    val z = shiftright(h, LogM)
    val rho = when(z === 0, lit(RMAX))
      .otherwise(bit_count(z.bitwiseAND(-z) - 1) + lit(1))
    keyed
      .withColumn("__b", (h % M).cast("long"))
      .withColumn("__r", rho.cast("long"))
      .filter(col("__r").isNotNull)
      .groupBy(groupCols.map(col) :+ col("__b").as("bucket"): _*)
      .agg(max(col("__r")).as("reg"))
      .select(groupCols.map(col) :+ col("bucket") :+ col("reg"): _*)
  }

  /** Distinct-WORD sketch per group over documents — the flagship use:
    * vocabulary cardinality per source/slice without a corpus-wide
    * distinct. */
  def wordSketch(docs: DataFrame, groupCol: String = "source",
                 textCol: String = "text"): DataFrame =
    registerSketch(
      docs.filter(col(textCol).isNotNull)
        .select(col(groupCol),
          explode(TextHash.words(col(textCol))).as("__w")),
      col("__w"), Seq(groupCol))

  /** Merge register tables — componentwise max (associative, commutative,
    * idempotent: replays absorb). */
  def mergeSketches(a: DataFrame, b: DataFrame,
                    groupCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(max(col("reg")).as("reg"))

  /** Integer-exact estimate per group from a register table:
    * (group…, est). Empty buckets contribute 2^RMAX to the harmonic sum
    * and count toward V; the LC correction reads the precomputed table. */
  def estimate(regs: DataFrame, groupCols: Seq[String]): DataFrame =
    regs
      .groupBy(groupCols.map(col): _*)
      .agg(
        (sum(expr(s"shiftleft(CAST(1 AS BIGINT), $RMAX - reg)")) +
          (lit(M.toLong) - count(lit(1))) * lit(1L << RMAX)).as("__s"),
        (lit(M.toLong) - count(lit(1))).as("__v"))
      .withColumn("__raw",
        expr(s"(${AlphaMicro}L * $M * $M * ${1L << RMAX}L) DIV __s"))
      .withColumn("est",
        when(col("__v") > 0 && col("__raw") <= LcCutMicro,
          expr(s"element_at(array(${LcMicro.mkString("L,")}L), " +
            "CAST(__v AS INT)) DIV 1000000"))
          .otherwise(expr("__raw DIV 1000000")))
      .select(groupCols.map(col) :+ col("est"): _*)

  // ── DuckDB side (same constants, same integer math) ───────────────────
  /** SQL literal for the LC table. */
  def sqlLcList: String = LcMicro.mkString("[", ", ", "]")

  /** CTEs `<p>regs(group…, bucket, reg)` over a token CTE
    * `<src>(grp, k)` — grp the group column, k the key string. */
  def sqlRegisterCtes(src: String, p: String = ""): String =
    s"""${p}h AS (SELECT grp, ${TextHash.sqlH32p("k")} AS h FROM $src),
       |${p}regs AS (
       |  SELECT grp, h % $M AS bucket,
       |         max(CASE WHEN h // $M = 0 THEN $RMAX
       |                  ELSE bit_count(((h // $M) & -(h // $M)) - 1) + 1
       |             END) AS reg
       |  FROM ${p}h WHERE h IS NOT NULL GROUP BY 1, 2)""".stripMargin

  /** CTE `<p>est(grp, est)` from `<p>regs`. */
  def sqlEstimateCte(p: String = ""): String =
    s"""${p}agg AS (
       |  SELECT grp,
       |         sum(CAST(1 AS BIGINT) << ($RMAX - reg))
       |           + ($M - count(*)) * (CAST(1 AS BIGINT) << $RMAX) AS s,
       |         $M - count(*) AS v
       |  FROM ${p}regs GROUP BY 1),
       |${p}est AS (
       |  SELECT grp,
       |         CASE WHEN v > 0
       |                   AND (CAST($AlphaMicro AS BIGINT) * $M * $M
       |                        * (CAST(1 AS BIGINT) << $RMAX)) // s
       |                       <= $LcCutMicro
       |              THEN list_extract($sqlLcList, CAST(v AS INT)) // 1000000
       |              ELSE ((CAST($AlphaMicro AS BIGINT) * $M * $M
       |                     * (CAST(1 AS BIGINT) << $RMAX)) // s) // 1000000
       |         END AS est
       |  FROM ${p}agg)""".stripMargin
}
