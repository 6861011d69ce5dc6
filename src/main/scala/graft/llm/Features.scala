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
    val ids = docs.select(col(idCol).as("doc_id"))
    val wp = docs.select(col(idCol).as("doc_id"),
      explode(words(col(textCol))).as("w"))
    val bs = wp.select(col("doc_id"),
      (TextHash.h32p(col("w")) % dim).cast("int").as("b"),
      when(TextHash.h32p(concat(lit("sgn:"), col("w"))) % 2 === 0, 1L)
        .otherwise(-1L).as("s"))
    val m = bs.groupBy(col("doc_id"), col("b"))
      .agg(sum(col("s")).as("c"))
      .groupBy(col("doc_id"))
      .agg(map_from_entries(collect_list(struct(col("b"), col("c"))))
        .as("__m"))
    ids.join(m, Seq("doc_id"), "left")
      .select(col("doc_id").as(idCol),
        transform(sequence(lit(0), lit(dim - 1)), i =>
          coalesce(element_at(col("__m"), i), lit(0L)).cast("double"))
          .as("v"))
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
    require(dim >= 2 && dim <= 4096,
      s"dim=$dim: hashed-TF buckets must be in [2, 4096]")
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
    val m = bs.groupBy(col("doc_id"), col("b"))
      .agg(sum(col("s")).as("c"))
      .groupBy(col("doc_id"))
      .agg(map_from_entries(collect_list(struct(col("b"), col("c"))))
        .as("__m"))
    ids.join(m, Seq("doc_id"), "left")
      .select(col("doc_id").as(idCol),
        transform(sequence(lit(0), lit(dim - 1)), i =>
          coalesce(element_at(col("__m"), i), lit(0L)).cast("double"))
          .as("v"))
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
}
