package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import TextHash.words

/** Deterministic text featurization — the bridge from the text corpus
  * into the embedding-space family ([[Similarity]]) without a learned
  * encoder. The hashing trick (Weinberger et al. 2009): each word hashes
  * to one of `dim` buckets with a ±1 sign from an independent hash, and
  * a document's vector is the per-bucket signed count. Sign hashing
  * makes collisions cancel in expectation instead of piling up, so
  * cosine between hashed vectors estimates cosine between the true
  * bag-of-words vectors.
  *
  * Everything is constant-derived (the shared md5 hash — no RNG, no
  * fitted vocabulary, no stored state), so both engines featurize
  * identically and an incremental batch needs no artifact at all: the
  * featurizer of one doc depends on that doc alone.
  */
object Features {

  /** (idCol, v) — the `dim`-length signed-count vector of each document.
    * Counts are exact integers carried as DOUBLE (±1 sums are exact in
    * floating point far beyond any real doc length), so downstream
    * cosines are bit-deterministic across engines. Empty and NULL texts
    * yield the all-zero vector — zero-norm, hence inert in every cosine
    * consumer (NULL cosine, never a pair, never a neighbor).
    *
    * Scale shape: explode is narrow; the signed count is ONE map-side
    * combined shuffle on (doc, bucket); vector assembly is a doc-keyed
    * groupBy into a map + a narrow dense transform. No broadcast, no
    * global state, embarrassingly parallel across docs — the featurizer
    * composes with [[Similarity.signLshNearDupPairs]] /
    * [[Similarity.signLshIncrementalPairs]] into a full text → vector →
    * LSH near-dup pipeline with no model anywhere. */
  def hashedTfVectors(docs: DataFrame, dim: Int = 64,
                      idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    require(dim >= 2 && dim <= 4096,
      s"dim=$dim: hashed-TF buckets must be in [2, 4096]")
    // ONE narrow per-row pass ([[graft.functions.HashedTf]]): the vector
    // is a pure function of the document's own words, so the previous
    // explode → (doc, bucket) aggregation → per-doc map → dense
    // transform shape paid two exchanges, an ObjectHashAggregate and
    // O(dim) element_at map scans per slot for nothing. Long bucket sums
    // are order-free, so the fused form is bit-identical (the oracle twin
    // replays the group-by form unchanged). NULL text (words → NULL)
    // coalesces to the zero vector — exactly the docless-id outcome of
    // the old ids LEFT join.
    val zero = typedLit(Seq.fill(dim)(0.0d))
    docs.select(col(idCol),
      coalesce(
        call_function(graft.functions.GraftFunctions.HashedTfName,
          words(col(textCol)), lit(dim)),
        zero).as("v"))
  }

  /** The ADDITIVE document-frequency census: (wh = 64-bit md5 prefix of
    * the word, df = DISTINCT documents containing it) — the IDF side of
    * [[hashedTfIdfVectors]], persisted exactly like the span census:
    * doc-disjoint batches merge by pure addition ([[mergeDfCensus]])
    * into the union's census. One explode + one map-side-combined
    * distinct count; word text never leaves the map side. */
  def dfCensus(docs: DataFrame, idCol: String = "doc_id",
               textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(words(col(textCol))).as("w"))
      .groupBy(TextHash.h64x(col("w")).as("wh"))
      .agg(countDistinct(col("doc_id")).as("df"))

  /** Fold a new doc-disjoint batch's census into a persisted artifact —
    * pure addition on the word hash (the [[Dedup.mergeSpanCensus]]
    * contract at word granularity). NULL word hashes group as one key,
    * which is what lets [[dfCensusWithCount]]'s sentinel row ride the
    * same merge. */
  def mergeDfCensus(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("wh")).agg(sum(col("df")).as("df"))

  /** [[dfCensus]] plus the corpus size riding the SAME frame as one
    * sentinel row (wh = NULL — no word hashes to NULL, and both engines
    * group NULL keys as one): `nDocs` is exactly as additive as the dfs,
    * so [[mergeDfCensus]] carries both without special-casing and a
    * persisted artifact is SELF-DESCRIBING — no side-channel doc count
    * to keep in sync with the census (the drift the two-writer manifest
    * bug classically produces). [[censusParts]] splits it back. */
  def dfCensusWithCount(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame =
    dfCensus(docs, idCol, textCol).unionByName(
      docs.agg(countDistinct(col(idCol)).as("df"))
        .select(lit(null).cast("string").as("wh"), col("df")))

  /** Split a self-describing census into (word census, nDocs). Fails
    * loudly on an artifact without the sentinel — that is a plain
    * [[dfCensus]] frame, whose corpus size the caller must track. */
  def censusParts(census: DataFrame): (DataFrame, Long) = {
    val n = census.filter(col("wh").isNull).select(col("df"))
      .collect()
    require(n.nonEmpty,
      "censusParts: no nDocs sentinel (wh IS NULL) row — this census was " +
        "not written by dfCensusWithCount")
    (census.filter(col("wh").isNotNull), n.map(_.getLong(0)).sum)
  }

  /** TF-IDF-weighted hashed vectors: [[hashedTfVectors]] with each word
    * occurrence contributing `sign · idf` instead of `sign · 1`, where
    * `idf = (nDocs·1000) DIV df` — a RATIONAL idf (a monotone transform
    * of N/df in truncating nonnegative integer division, the
    * [[Sampling.mixturePlan]] arithmetic) rather than the usual
    * `ln(N/df)`, because both engines divide integers identically while
    * `ln` has no cross-engine bit contract. A word in every doc weighs
    * 1000; a word in one doc weighs 1000·N — stopword mass stops
    * drowning the rare words that actually identify a document, which
    * is what separates near-dup detection on real text from plain TF.
    * Words absent from the census (a NEW batch scored against an OLD
    * artifact) take df = 1, the maximally-rare reading.
    *
    * `nDocs` is the census's corpus size — callers track it alongside
    * the artifact (it is one `count`, additive across batches like the
    * census itself). Scale shape adds ONE join to the TF path: exploded
    * words against the vocab-sized census, keyed on the word hash —
    * shuffle-joined at census scale, broadcast when small; everything
    * else is the TF pipeline unchanged. */
  def hashedTfIdfVectors(docs: DataFrame, census: DataFrame, nDocs: Long,
                         dim: Int = 64, idCol: String = "doc_id",
                         textCol: String = "text"): DataFrame = {
    // the pivot below builds ONE conditional aggregate per bucket, so
    // dim bounds the aggregation's expression count — 256 keeps the
    // generated aggregate comfortably inside whole-stage-codegen's
    // method-size limits (round-16 ADVICE: at the old 4096 cap the agg
    // would fall back to interpreted eval or choke the planner); a
    // wider featurizer should go back to the (doc, bucket) map
    // aggregation shape instead of widening this pivot
    require(dim >= 2 && dim <= 256,
      s"dim=$dim: the pivoted hashed-TF-IDF aggregation is bounded to " +
        "[2, 256] buckets (one conditional aggregate per bucket)")
    require(nDocs >= 1, s"nDocs=$nDocs: the census corpus cannot be empty")
    val ids = docs.select(col(idCol).as("doc_id"))
    val wp = docs.select(col(idCol).as("doc_id"),
      explode(words(col(textCol))).as("w"))
    val bs = wp
      .withColumn("wh", TextHash.h64x(col("w")))
      .join(census.select(col("wh"), col("df")), Seq("wh"), "left")
      .select(col("doc_id"),
        (TextHash.h32p(col("w")) % dim).cast("int").as("b"),
        (when(TextHash.h32p(concat(lit("sgn:"), col("w"))) % 2 === 0, 1L)
          .otherwise(-1L) *
          expr(s"${nDocs}L * 1000L DIV coalesce(df, 1L)")).as("s"))
    // ONE doc-keyed aggregation pivoting the dim bucket sums into
    // columns, instead of the previous (doc, bucket) aggregation →
    // per-doc map assembly (ObjectHashAggregate) → O(dim) element_at
    // map scans per output slot: one exchange fewer, map-side combine
    // unchanged, and the same LONG bucket sums (order-free, so the
    // regrouping is bit-identical; the oracle twin is untouched). The
    // ids LEFT join still restores no-word docs; their all-NULL sums
    // coalesce to the zero vector exactly as the missing-map rows did.
    val sums = (0 until dim).map(i =>
      sum(when(col("b") === i, col("s"))).as(s"__s$i"))
    val m = bs.groupBy(col("doc_id")).agg(sums.head, sums.tail: _*)
    ids.join(m, Seq("doc_id"), "left")
      .select(col("doc_id").as(idCol),
        array((0 until dim).map(i =>
          coalesce(col(s"__s$i"), lit(0L)).cast("double")): _*).as("v"))
  }

  /** DuckDB CTE fragment replaying [[dfCensus]] + [[hashedTfIdfVectors]]
    * over a (doc_id, text) CTE `src` with the census built from `src`
    * itself (the batch-static case), ending at `tivec(doc_id, v)`.
    * `nDocs` is the scalar subquery `(SELECT count(*) FROM src)`. */
  def sqlHashedTfIdfCtes(src: String, dim: Int): String =
    s"""tiw AS (SELECT doc_id, unnest(${TextHash.sqlWords("text")}) AS w
       |        FROM $src),
       |tidf AS (SELECT ${TextHash.sqlH64x("w")} AS wh,
       |                count(DISTINCT doc_id) AS df
       |         FROM tiw GROUP BY 1),
       |tin AS (SELECT count(*) AS n FROM $src),
       |tib AS (SELECT t.doc_id,
       |               ${TextHash.sqlH32p("t.w")} % $dim AS b,
       |               (CASE WHEN ${TextHash.sqlH32p("concat('sgn:', t.w)")} % 2 = 0
       |                     THEN 1 ELSE -1 END)
       |               * ((SELECT n FROM tin) * 1000 // coalesce(c.df, 1)) AS s
       |        FROM tiw t LEFT JOIN tidf c
       |          ON ${TextHash.sqlH64x("t.w")} = c.wh),
       |tiagg AS (SELECT doc_id, b, sum(s) AS c FROM tib GROUP BY doc_id, b),
       |tidims AS (SELECT unnest(range(0, $dim)) AS b),
       |tidense AS (SELECT d.doc_id, dm.b, coalesce(a.c, 0) AS c
       |            FROM (SELECT DISTINCT doc_id FROM $src) d
       |            CROSS JOIN tidims dm
       |            LEFT JOIN tiagg a ON a.doc_id = d.doc_id AND a.b = dm.b),
       |tivec AS (SELECT doc_id, list(CAST(c AS DOUBLE) ORDER BY b) AS v
       |          FROM tidense GROUP BY doc_id)""".stripMargin

  /** DuckDB CTE fragment replaying [[hashedTfVectors]] over a
    * (doc_id, text) CTE `src`, ending at `tfvec(doc_id, v)` — same word
    * split, same bucket and sign hashes, same integer counts cast to
    * DOUBLE in bucket order. */
  def sqlHashedTfCtes(src: String, dim: Int): String =
    s"""tfw AS (SELECT doc_id, unnest(${TextHash.sqlWords("text")}) AS w
       |        FROM $src),
       |tfb AS (SELECT doc_id,
       |               ${TextHash.sqlH32p("w")} % $dim AS b,
       |               CASE WHEN ${TextHash.sqlH32p("concat('sgn:', w)")} % 2 = 0
       |                    THEN 1 ELSE -1 END AS s
       |        FROM tfw),
       |tfagg AS (SELECT doc_id, b, sum(s) AS c FROM tfb GROUP BY doc_id, b),
       |tfdims AS (SELECT unnest(range(0, $dim)) AS b),
       |tfdense AS (SELECT d.doc_id, dm.b, coalesce(a.c, 0) AS c
       |            FROM (SELECT DISTINCT doc_id FROM $src) d
       |            CROSS JOIN tfdims dm
       |            LEFT JOIN tfagg a ON a.doc_id = d.doc_id AND a.b = dm.b),
       |tfvec AS (SELECT doc_id, list(CAST(c AS DOUBLE) ORDER BY b) AS v
       |          FROM tfdense GROUP BY doc_id)""".stripMargin

  /** BM25 retrieval (Robertson–Spärck Jones probabilistic ranking, the
    * Okapi BM25 form — Robertson & Zaragoza 2009): per query, the top-k
    * documents by Σ_t idf(t) · tf-saturation(t, d). The lexical-search
    * counterpart of the embedding ANN family — the retrieval baseline a
    * training-data pipeline needs for eval-set mining, hard-negative
    * selection, and corpus QA ("which docs answer this probe").
    *
    * Cross-engine arithmetic: every quantity below the one `ln` is an
    * INTEGER in explicit scaled units with a pinned operation order —
    * `avgdl_milli = (T·1000) DIV N`, per-doc length normalization
    * `dnorm_micro = (1000−b‰)·1000 + (b‰·10⁶·dl) DIV avgdl_milli`, term
    * saturation `tfnorm_micro = ((1000+k1‰)·1000·tf·10⁶) DIV
    * (tf·10⁶ + (k1‰·dnorm_micro) DIV 1000)` — so both engines divide
    * identically (`DIV`/`//`). The idf rides the house `floor(1e6·ln)`
    * contract (the [[LangModel]] discipline): `idf_micro =
    * floor(1e6 · ln(1 + (N − df + 0.5)/(df + 0.5)))` — ≥ 0 by
    * construction (the +1 inside the ln is exactly the guard against
    * the classic negative-idf-for-common-terms artifact). Scores are
    * `bm25_pico` (micro·micro) integer sums.
    *
    * Scale shape: ONE corpus explode (the persisted word-pair barrier
    * feeds doc lengths, the query-pruned df census, and tf counts);
    * the query side is broadcast everywhere (queries are probe-sized by
    * contract); df counts only query terms (vocab pruned BEFORE the
    * distinct count — never a full-vocabulary census); the top-k is
    * [[KeepKSmallest]]'s bounded heap on the negated score (map-side
    * partials collapse to ≤ k rows per query per partition — no window
    * sort over the scored corpus). Wordless docs never score (they
    * contain no term); N and avgdl are over docs WITH words — stated,
    * deterministic, and matched by the twin. Ties break by the doc id's
    * STRING form in UTF-8 order ([[KeepKSmallest]]'s contract).
    *
    * `queries`: (query_id, qtext) — tokenized with the same [[words]]
    * split as documents. Terms absent from the corpus contribute 0.
    * Returns (query_id, rnk, doc_id, bm25_pico), rnk 1-based. */
  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int,
               k1Pm: Long = 1200L, bPm: Long = 750L,
               idCol: String = "doc_id", textCol: String = "text",
               queryIdCol: String = "query_id",
               queryTextCol: String = "qtext"): DataFrame =
    bm25TopKFromCensus(bm25Census(docs, idCol, textCol), queries, k,
      k1Pm, bPm, queryIdCol, queryTextCol)

  /** The BM25 index artifact: a term-frequency census
    * `(doc_id, wh, tf)` — ONE row per (document, hashed term). Every
    * statistic BM25 needs derives from it (`dl = Σ tf` per doc,
    * `N` = distinct docs, `T = Σ tf`, `df` per term), so the census is
    * the complete additive index state: batches of NEW documents append
    * their censuses ([[mergeBm25Census]]) and scoring never re-reads
    * document text — the incremental form the df-census family already
    * uses ([[hashedTfIdf]]'s discipline). */
  def bm25Census(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        explode(words(col(textCol))).as("w"))
      .select(col("doc_id"), TextHash.h64x(col("w")).as("wh"))
      .groupBy(col("doc_id"), col("wh"))
      .agg(count(lit(1)).as("tf"))

  /** Additive merge of BM25 censuses (document batches, shards). Sums
    * tf per (doc, term) so a document whose text arrives split across
    * batches folds correctly too — for disjoint doc batches this is a
    * plain append. */
  def mergeBm25Census(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("doc_id"), col("wh"))
      .agg(sum(col("tf")).as("tf"))

  /** [[bm25TopK]] scored from a persisted census instead of raw text —
    * the batch/incremental path. Identical output to the one-shot form
    * on the same corpus (q174 pins the identity cross-engine). */
  def bm25TopKFromCensus(census: DataFrame, queries: DataFrame, k: Int,
                         k1Pm: Long = 1200L, bPm: Long = 750L,
                         queryIdCol: String = "query_id",
                         queryTextCol: String = "qtext"): DataFrame = {
    require(k >= 1, s"bm25TopK: k=$k")
    require(k1Pm >= 0L, s"bm25TopK: k1Pm=$k1Pm")
    require(bPm >= 0L && bPm <= 1000L,
      s"bm25TopK: bPm=$bPm out of [0, 1000]")
    val spark = census.sparkSession
    import spark.implicits._
    val cen = graft.CacheBarriers.barrier(census)
    val stats = cen.agg(countDistinct(col("doc_id")).as("__n"),
      sum(col("tf")).as("__t"))
    val dl = cen.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val qterms = graft.CacheBarriers.barrier(queries
      .select(col(queryIdCol).cast("string").as("query_id"),
        explode(words(col(queryTextCol))).as("qw"))
      .select(col("query_id"), TextHash.h64x(col("qw")).as("wh"))
      .distinct())
    val dfq = cen
      .join(broadcast(qterms.select(col("wh")).distinct()), Seq("wh"))
      .groupBy(col("wh")).agg(countDistinct(col("doc_id")).as("df"))
    val tf = cen.join(broadcast(qterms), Seq("wh"))
      .select(col("query_id"), col("doc_id"), col("wh"), col("tf"))
    val perDoc = tf
      .join(broadcast(dfq), Seq("wh"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("avgdl_milli", expr("__t * 1000 DIV __n"))
      .withColumn("idf_micro", expr(
        "CAST(floor(1e6 * ln(1.0 + ((CAST(__n AS DOUBLE) " +
          "- CAST(df AS DOUBLE)) + 0.5) / (CAST(df AS DOUBLE) + 0.5))) " +
          "AS BIGINT)"))
      .withColumn("dnorm_micro",
        lit((1000L - bPm) * 1000L) +
          expr(s"($bPm * 1000000 * dl) DIV avgdl_milli"))
      .withColumn("tfnorm_micro", expr(
        s"((${(1000L + k1Pm) * 1000L} * tf) * 1000000) DIV " +
          s"(tf * 1000000 + ($k1Pm * dnorm_micro) DIV 1000)"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("idf_micro") * col("tfnorm_micro")).as("bm25_pico"))
    perDoc
      .select(col("query_id").as("stratum"),
        (-col("bm25_pico")).as("h"),
        col("doc_id").cast("string").as("id"))
      .as[KeepCand]
      .groupByKey(_.stratum)
      .agg(new KeepKSmallest(k).toColumn)
      .flatMap { case (q, buf) =>
        buf.items.zipWithIndex.map { case (c, i) =>
          (q, (i + 1).toLong, c.id, -c.h)
        }
      }
      .toDF("query_id", "rnk", "doc_id", "bm25_pico")
  }

  /** DuckDB twin of [[bm25TopK]] over a `(doc_id, text)` CTE `src` and a
    * query CTE `qsrc(query_id, qtext)`, ending at
    * `bmtop(query_id, rnk, doc_id, bm25_pico)`. Same word split, same
    * 64-bit word-hash join keys (hash collisions merge terms identically
    * on both engines), same pinned integer-division order, same
    * `floor(1e6·ln)` idf, same (score DESC, doc_id ASC) tie order. */
  def sqlBm25Ctes(src: String, qsrc: String, k: Int,
                  k1Pm: Long = 1200L, bPm: Long = 750L): String =
    s"""bmw AS (SELECT doc_id, ${TextHash.sqlH64x("w")} AS wh FROM (
       |          SELECT doc_id, unnest(${TextHash.sqlWords("text")}) AS w
       |          FROM $src)),
       |bmq AS (SELECT DISTINCT query_id, ${TextHash.sqlH64x("w")} AS wh
       |        FROM (SELECT query_id, unnest(${TextHash.sqlWords("qtext")}) AS w
       |              FROM $qsrc)),
       |bmst AS (SELECT count(DISTINCT doc_id) AS n, count(*) AS t FROM bmw),
       |bmdl AS (SELECT doc_id, count(*) AS dl FROM bmw GROUP BY 1),
       |bmdf AS (SELECT wh, count(DISTINCT doc_id) AS df FROM bmw
       |         WHERE wh IN (SELECT wh FROM bmq) GROUP BY 1),
       |bmtf AS (SELECT q.query_id, w.doc_id, w.wh, count(*) AS tf
       |         FROM bmw w JOIN bmq q ON w.wh = q.wh GROUP BY 1, 2, 3),
       |bmsc AS (
       |  SELECT query_id, doc_id,
       |         CAST(sum(CAST(floor(1e6 * ln(1.0 + ((CAST(n AS DOUBLE)
       |               - CAST(df AS DOUBLE)) + 0.5)
       |               / (CAST(df AS DOUBLE) + 0.5))) AS BIGINT)
       |             * (((${(1000L + k1Pm) * 1000L} * tf) * 1000000) //
       |                (tf * 1000000 +
       |                 ($k1Pm * (${(1000L - bPm) * 1000L} +
       |                   ($bPm * 1000000 * dl) // ((t * 1000) // n)))
       |                 // 1000))) AS BIGINT) AS bm25_pico
       |  FROM bmtf JOIN bmdf USING (wh) JOIN bmdl USING (doc_id), bmst
       |  GROUP BY 1, 2),
       |bmtop AS (
       |  SELECT query_id, rnk, doc_id, bm25_pico FROM (
       |    SELECT query_id, CAST(doc_id AS VARCHAR) AS doc_id, bm25_pico,
       |           CAST(row_number() OVER (PARTITION BY query_id
       |             ORDER BY bm25_pico DESC,
       |                      CAST(doc_id AS VARCHAR) ASC) AS BIGINT) AS rnk
       |    FROM bmsc) WHERE rnk <= $k)""".stripMargin

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttner, SIGIR 2009):
    * combine per-query ranked lists from heterogeneous retrieval
    * systems (lexical BM25, dense ANN, …) by
    * `score(d) = Σ_systems 1/(C + rank_s(d))` — rank-only, so the
    * systems' incomparable score scales never meet. Contributions are
    * exact integers (`10⁹ DIV (C + rank)`), summed per (query, doc);
    * self-pairs (a probe retrieving its own document) are dropped AFTER
    * fusion so both engines shift ranks identically. Input `ranked`:
    * the UNION of system lists as `(query_id, doc_id, rnk)` strings +
    * 1-based ranks; each system's list is probe×depth-sized, so the
    * fusion aggregate is tiny regardless of corpus size. Top-k rides
    * [[KeepKSmallest]]'s bounded heap with the house
    * (score DESC, doc_id ASC) tie order.
    * Returns (query_id, rnk, doc_id, rrf_nano). */
  def rrfTopK(ranked: DataFrame, k: Int, c: Long = 60L): DataFrame = {
    require(k >= 1, s"rrfTopK: k=$k")
    require(c >= 0L, s"rrfTopK: c=$c")
    val spark = ranked.sparkSession
    import spark.implicits._
    ranked
      .withColumn("__contrib", expr(s"1000000000L DIV ($c + rnk)"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("__contrib")).as("rrf_nano"))
      .filter(col("doc_id") =!= col("query_id"))
      .select(col("query_id").as("stratum"), (-col("rrf_nano")).as("h"),
        col("doc_id").as("id"))
      .as[KeepCand]
      .groupByKey(_.stratum)
      .agg(new KeepKSmallest(k).toColumn)
      .flatMap { case (q, buf) =>
        buf.items.zipWithIndex.map { case (cd, i) =>
          (q, (i + 1).toLong, cd.id, -cd.h)
        }
      }
      .toDF("query_id", "rnk", "doc_id", "rrf_nano")
  }
}
