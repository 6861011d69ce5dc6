package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (Xie et al. 2023, DSIR) in
  * its hashed-n-gram form: score every raw document by how much more
  * likely its words are under a TARGET distribution (the data you want
  * more of — a domain, a language, a curated seed set) than under the
  * raw distribution, then keep the high scorers. The score is a
  * log-likelihood ratio over hashed word-feature buckets:
  *
  *   imp(doc) = Σ_w  ln p̂_target(b(w)) − ln p̂_raw(b(w))
  *
  * with add-one smoothing over `B` buckets. Both distributions are
  * ADDITIVE bucket censuses (the repo's artifact contract — batches
  * merge by pure addition, a persisted census scores tomorrow's batch
  * without re-reading anything).
  *
  * Determinism: each bucket's two log-probabilities are floored to
  * integer micro-nats SEPARATELY (`floor(1e6·ln(p))` — the
  * [[LangModel]] contract; `ln` is the one engine-approximate op, with
  * the same astronomically-unlikely flip bound), so the per-document
  * reduce is an integer sum — order-free, cross-engine exact given
  * equal floors.
  *
  * Scale shape: censuses are one map-side-combined shuffle each (B
  * buckets — B rows, control-plane-sized); the log-ratio table is a
  * B-row broadcast; scoring is one narrow explode + broadcast join +
  * doc-keyed sum. Nothing corpus-sized persists, nothing collects.
  */
object Dsir {

  /** Hashed feature buckets. 4096 is the published hashed-n-gram scale
    * for unigram features; the census is B rows regardless of corpus
    * size. */
  val B = 4096

  private def bucket(w: org.apache.spark.sql.Column) =
    (TextHash.h32p(w) % B).cast("long")

  /** (b, n): the hashed word-bucket census — one explode + one
    * map-side-combined shuffle to B rows. */
  def featureCensus(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(TextHash.words(col(textCol))).as("w"))
      .select(bucket(col("w")).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("n"))

  /** Fold a batch census into a persisted one — pure addition. */
  def mergeFeatureCensus(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("b")).agg(sum(col("n")).as("n"))

  /** The (b, lr) log-ratio table from two censuses — B rows, the
    * broadcast side of scoring. Buckets absent from one census read
    * count 0 (smoothed to 1). All-relational: totals ride 1-row
    * broadcast cross joins, no driver scalar anywhere. */
  def importanceTable(targetCensus: DataFrame,
                      rawCensus: DataFrame): DataFrame = {
    val tot = targetCensus
      .agg(coalesce(sum(col("n")), lit(0L)).as("__T"))
      .crossJoin(broadcast(
        rawCensus.agg(coalesce(sum(col("n")), lit(0L)).as("__R"))))
    targetCensus.select(col("b"), col("n").as("__tn"))
      .join(rawCensus.select(col("b"), col("n").as("__rn")),
        Seq("b"), "full_outer")
      .crossJoin(broadcast(tot))
      .select(col("b"),
        (floor(lit(1e6) * log((coalesce(col("__tn"), lit(0L)) + 1)
            .cast("double") / (col("__T") + B))) -
          floor(lit(1e6) * log((coalesce(col("__rn"), lit(0L)) + 1)
            .cast("double") / (col("__R") + B))))
          .cast("long").as("lr"))
  }

  /** The never-seen-anywhere bucket's log ratio — a 1-row frame
    * (both smoothed counts are 1; only the totals differ). */
  private def oovRatio(targetCensus: DataFrame,
                       rawCensus: DataFrame): DataFrame =
    targetCensus.agg(coalesce(sum(col("n")), lit(0L)).as("__T"))
      .crossJoin(broadcast(
        rawCensus.agg(coalesce(sum(col("n")), lit(0L)).as("__R"))))
      .select(
        (floor(lit(1e6) * log(lit(1.0) / (col("__T") + B))) -
          floor(lit(1e6) * log(lit(1.0) / (col("__R") + B))))
          .cast("long").as("__oov"))

  /** Decorate docs with (n_feats, imp_micro): the integer micro-nat
    * importance score. Wordless docs score 0 over 0 features (inert in
    * any threshold gate that requires positive evidence). */
  def withImportance(docs: DataFrame, targetCensus: DataFrame,
                     rawCensus: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    val lrt = importanceTable(targetCensus, rawCensus)
    val scored = docs
      .select(col(idCol), explode(TextHash.words(col(textCol))).as("w"))
      .select(col(idCol), bucket(col("w")).as("b"))
      .join(broadcast(lrt), Seq("b"), "left")
      .crossJoin(broadcast(oovRatio(targetCensus, rawCensus)))
      .select(col(idCol), coalesce(col("lr"), col("__oov")).as("__lr"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"), sum(col("__lr")).as("imp_micro"))
    docs.join(scored, Seq(idCol), "left")
      .withColumn("n_feats", coalesce(col("n_feats"), lit(0L)))
      .withColumn("imp_micro", coalesce(col("imp_micro"), lit(0L)))
  }

  // ── DuckDB twins ──────────────────────────────────────────────────────

  /** CTE chain replaying census → log-ratio table → per-doc scores over
    * `(doc_id, text)` CTEs `dsraw` (the corpus to score = the raw
    * distribution) and `dstarget`. Ends at `dsscore(doc_id, n_feats,
    * imp_micro)` — docs absent there are wordless (score 0 / 0 by the
    * caller's coalesce). */
  def sqlImportanceCtes: String = {
    val b = s"(${TextHash.sqlH32p("w")}) % $B"
    s"""dstw AS (SELECT unnest(${TextHash.sqlWords("text")}) AS w FROM dstarget),
       |dstc AS (SELECT $b AS b, count(*) AS n FROM dstw GROUP BY 1),
       |dsrw AS (SELECT doc_id, unnest(${TextHash.sqlWords("text")}) AS w FROM dsraw),
       |dsrc AS (SELECT $b AS b, count(*) AS n FROM dsrw GROUP BY 1),
       |dstot AS (SELECT (SELECT coalesce(sum(n), 0) FROM dstc) AS t,
       |                 (SELECT coalesce(sum(n), 0) FROM dsrc) AS r),
       |dslr AS (SELECT coalesce(tc.b, rc.b) AS b,
       |                CAST(floor(1e6 * ln((coalesce(tc.n, 0) + 1) / CAST((SELECT t FROM dstot) + $B AS DOUBLE)))
       |                   - floor(1e6 * ln((coalesce(rc.n, 0) + 1) / CAST((SELECT r FROM dstot) + $B AS DOUBLE)))
       |                     AS BIGINT) AS lr
       |         FROM dstc tc FULL OUTER JOIN dsrc rc ON tc.b = rc.b),
       |dsoov AS (SELECT CAST(floor(1e6 * ln(1.0 / CAST((SELECT t FROM dstot) + $B AS DOUBLE)))
       |                    - floor(1e6 * ln(1.0 / CAST((SELECT r FROM dstot) + $B AS DOUBLE)))
       |                      AS BIGINT) AS oov),
       |dsscore AS (SELECT d.doc_id, count(*) AS n_feats,
       |                   sum(coalesce(l.lr, (SELECT oov FROM dsoov))) AS imp_micro
       |            FROM (SELECT doc_id, $b AS b FROM dsrw) d
       |            LEFT JOIN dslr l ON d.b = l.b
       |            GROUP BY d.doc_id)""".stripMargin
  }
}
