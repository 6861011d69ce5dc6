package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bottom-k DISTINCT hash buffer for the KMV sketch — kept sorted
  * ascending, never longer than k. Distinctness is part of the insert
  * (not a pre-pass): KMV's estimator reads the k-th smallest DISTINCT
  * value, and deduping inside the buffer is what makes the merge
  * idempotent (replaying a shard re-offers values the buffer already
  * holds, changing nothing). */
final case class KmvBuf(items: Seq[Long])

/** Bounded bottom-k-distinct as a typed [[Aggregator]] — the
  * [[graft.llm.KeepKSmallest]] shape specialized to distinct longs: map-side
  * partials collapse every partition's hashes to ≤ k values per group
  * BEFORE the shuffle, so the shuffle carries |groups|·partitions·k longs
  * where a distinct-then-window plan would shuffle every distinct
  * (group, hash) pair — vocabulary-cardinality, the thing the sketch
  * exists to avoid. Merge folds one buffer into the other: associative,
  * commutative, idempotent (distinct insert), the register-sketch
  * contract. */
final class KmvBottomK(k: Int) extends Aggregator[Long, KmvBuf, KmvBuf] {
  override def zero: KmvBuf = KmvBuf(Nil)

  override def reduce(buf: KmvBuf, h: Long): KmvBuf = {
    val items = buf.items
    if (items.length >= k && h >= items.last) buf
    else {
      val (smaller, rest) = items.span(_ < h)
      if (rest.headOption.contains(h)) buf // already held — idempotent
      else KmvBuf(((smaller :+ h) ++ rest).take(k))
    }
  }

  override def merge(x: KmvBuf, y: KmvBuf): KmvBuf =
    y.items.foldLeft(x)(reduce)

  override def finish(r: KmvBuf): KmvBuf = r
  override def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
  override def outputEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
}

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

  // ── KMV (k-minimum-values) sketch ─────────────────────────────────────
  // The register sketch's sibling with a different trade: instead of M
  // fixed registers it keeps the k smallest DISTINCT hash values per
  // group — still config-sized, still merge-by-fold (associative,
  // commutative, idempotent), but the kept values additionally support
  // SET ALGEBRA between groups: bottom-k of a union is computable from
  // the two sketches alone, which yields Jaccard estimates between
  // group vocabularies no register table can produce (registers forget
  // WHICH keys they saw; KMV keeps a deterministic uniform sample of
  // them). Bar-Yossef et al.'s k-minimum-values estimator (Beyer et
  // al.'s AKMV refinement gives the set-algebra reading): with hashes
  // uniform on [0, P), n̂ = (k−1)·P DIV h_(k). Error ~ 1/√k.

  /** Run the bounded bottom-k-distinct fold over (grp, h) rows.
    * Map-side partials collapse each partition to ≤ k values per group
    * before the shuffle — the whole point versus distinct-then-window. */
  private def bottomKRows(rows: DataFrame, groupCol: String,
                          k: Int): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.select(col(groupCol).cast("string").as("grp"), col("h"))
      .filter(col("h").isNotNull)
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(new KmvBottomK(k).toColumn)
      .flatMap { case (g, buf) => buf.items.map(hh => (g, hh)) }
      .toDF(groupCol, "h")
  }

  /** Per-group KMV sketch over one key column: (group, h) rows, ≤ k per
    * group, h ascending-distinct within the group. The group column is
    * emitted as STRING (the typed-state convention the diversity sample
    * uses). */
  def kmvSketch(keyed: DataFrame, key: Column, groupCol: String,
                k: Int): DataFrame = {
    require(k >= 2, s"kmvSketch: k=$k — the estimator reads h_(k), need k >= 2")
    bottomKRows(keyed.select(col(groupCol),
        TextHash.h32p(key).as("h")), groupCol, k)
  }

  /** Distinct-WORD KMV sketch per group — the vocabulary-overlap use. */
  def kmvWordSketch(docs: DataFrame, groupCol: String = "source",
                    textCol: String = "text", k: Int = 128): DataFrame =
    kmvSketch(
      docs.filter(col(textCol).isNotNull)
        .select(col(groupCol),
          explode(TextHash.words(col(textCol))).as("__w")),
      col("__w"), groupCol, k)

  /** Distinct word-n-gram KMV sketch per group — the content-overlap use
    * (the dedup family's shingle space): n-grams key PHRASING, so two
    * groups sharing a vocabulary but not sentences diverge here while
    * the word sketch calls them identical. Same bounded fold; the
    * per-doc `shingles` dedupe just thins the offered stream. */
  def kmvShingleSketch(docs: DataFrame, groupCol: String = "source",
                       textCol: String = "text", n: Int = 3,
                       k: Int = 128): DataFrame =
    kmvSketch(
      docs.filter(col(textCol).isNotNull)
        .select(col(groupCol),
          explode(TextHash.shingles(TextHash.words(col(textCol)), n))
            .as("__s")),
      col("__s"), groupCol, k)

  /** Merge KMV sketches: union + re-cap. Same fold as building — so
    * shard unions, day folds, and replays all land on the identical
    * sketch (idempotent via the distinct insert). */
  def mergeKmv(a: DataFrame, b: DataFrame, groupCol: String,
               k: Int): DataFrame =
    bottomKRows(a.unionByName(b), groupCol, k)

  /** Per-group distinct estimate from a KMV sketch: (group, n_kept, est).
    * A group whose sketch holds fewer than k values IS its whole distinct
    * set (nothing was evicted) — est is exact; otherwise the KMV
    * estimator (k−1)·P DIV h_(k). h_(k) ≥ k−1 ≥ 1 when full (k distinct
    * non-negative values), so the division cannot hit zero. */
  def kmvEstimate(sketch: DataFrame, groupCol: String, k: Int): DataFrame =
    sketch.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("__hk"))
      .withColumn("est",
        when(col("n_kept") < k, col("n_kept"))
          .otherwise(expr(s"(${k - 1}L * ${TextHash.P}L) DIV __hk")))
      .select(col(groupCol), col("n_kept"), col("est"))

  /** Pairwise vocabulary-overlap report between groups, from the sketches
    * alone: for each group pair (a < b), X = bottom-k of the DISTINCT
    * union of both sketches (k_eff = |X|, < k only when both sketches are
    * complete sets), inter = |X ∩ S_a ∩ S_b|, jacc_micro = inter·10⁶ DIV
    * k_eff (the KMV Jaccard estimator — exact when k_eff < k), union_est
    * = the KMV cardinality estimator on X. Every frame here is
    * sketch-sized (≤ |groups|²·2k rows — config², never data), so the
    * ranking window is the [[graft.llm.Similarity.diversityReportFromState]]
    * class, not a corpus sort. */
  def kmvJaccardMatrix(sketch: DataFrame, groupCol: String,
                       k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = sketch.select(col(groupCol).cast("string").as("g"), col("h"))
    val groups = s.select(col("g")).distinct()
    val pairs = groups.select(col("g").as("ga"))
      .crossJoin(groups.select(col("g").as("gb")))
      .filter(col("ga") < col("gb"))
    val memb = pairs.join(s, s("g") === col("ga") || s("g") === col("gb"))
      .groupBy(col("ga"), col("gb"), col("h"))
      .agg(max(when(col("g") === col("ga"), 1).otherwise(0)).as("in_a"),
        max(when(col("g") === col("gb"), 1).otherwise(0)).as("in_b"))
    val w = Window.partitionBy(col("ga"), col("gb")).orderBy(col("h").asc)
    memb.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .groupBy(col("ga").as("src_a"), col("gb").as("src_b"))
      .agg(count(lit(1)).as("k_eff"),
        sum(col("in_a") * col("in_b")).as("inter"),
        max(col("h")).as("__hk"))
      .withColumn("jacc_micro", expr("inter * 1000000L DIV k_eff"))
      .withColumn("union_est",
        when(col("k_eff") < k, col("k_eff"))
          .otherwise(expr(s"(${k - 1}L * ${TextHash.P}L) DIV __hk")))
      .select(col("src_a"), col("src_b"), col("k_eff"), col("inter"),
        col("jacc_micro"), col("union_est"))
  }

  /** CTE `<p>kmv(grp, h)` over a token CTE `<src>(grp, k)` — the oracle
    * realizes the same bottom-k-distinct semantics via distinct + window
    * (semantics, not plan — the Spark side's bounded heap exists for the
    * shuffle shape). */
  def sqlKmvCte(src: String, k: Int, p: String = ""): String =
    s"""${p}kmv AS (
       |  SELECT grp, h FROM (
       |    SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
       |    FROM (SELECT DISTINCT grp, ${TextHash.sqlH32p("k")} AS h FROM $src)
       |    WHERE h IS NOT NULL)
       |  WHERE rn <= $k)""".stripMargin

  /** CTE chain `pairs, memb, ranked, cells` over `<kmv>(grp, h)`:
    * cells(src_a, src_b, k_eff, inter, hk) — the [[kmvJaccardMatrix]]
    * twin up to the final arithmetic (jacc/union_est are one expression
    * each; callers fold them into their SELECT so column naming stays
    * in the query). */
  def sqlKmvMatrixCtes(kmv: String, k: Int): String =
    s"""kpairs AS (SELECT a.grp AS ga, b.grp AS gb
       |           FROM (SELECT DISTINCT grp FROM $kmv) a
       |           JOIN (SELECT DISTINCT grp FROM $kmv) b ON a.grp < b.grp),
       |kmemb AS (
       |  SELECT ga, gb, h,
       |         max(CASE WHEN s.grp = ga THEN 1 ELSE 0 END) AS in_a,
       |         max(CASE WHEN s.grp = gb THEN 1 ELSE 0 END) AS in_b
       |  FROM kpairs JOIN $kmv s ON s.grp = ga OR s.grp = gb
       |  GROUP BY 1, 2, 3),
       |kranked AS (SELECT *, row_number() OVER (PARTITION BY ga, gb ORDER BY h) AS rn
       |            FROM kmemb),
       |kcells AS (
       |  SELECT ga AS src_a, gb AS src_b, count(*) AS k_eff,
       |         sum(in_a * in_b) AS inter, max(h) AS hk
       |  FROM kranked WHERE rn <= $k GROUP BY 1, 2)""".stripMargin

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
