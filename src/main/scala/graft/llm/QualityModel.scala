package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based document quality filtering — the fastText-style binary
  * classifier of LLM-data pipelines (GPT-3 / CCNet lineage: train a
  * linear classifier to separate a trusted "positive" slice from the raw
  * crawl, keep documents the model scores positive). The model is a
  * per-token naive-Bayes log-odds table: with token counts `n_pos(t)`,
  * `n_neg(t)` over the two labeled classes,
  *
  *   w(t) = ln((n_pos(t)+1)/(N_pos+V)) − ln((n_neg(t)+1)/(N_neg+V))
  *
  * (add-one smoothing, V = vocabulary size) and a document's score is the
  * sum of its tokens' weights — exactly a linear text classifier whose
  * weights have a closed form, so "training" is one counting aggregation
  * and needs no iterative solver on the cluster. The class prior is
  * deliberately omitted: it is a per-corpus constant absorbed by the keep
  * threshold (documented so nobody re-adds it twice).
  *
  * Exactness contract (driver hash-compares against DuckDB): each side of
  * the weight is floored to integer micro-nats SEPARATELY
  * (`floor(1e6·ln(p_pos)) − floor(1e6·ln(p_neg))`), making the per-token
  * weight an integer and the per-document reduce an order-independent
  * `sum(long)` — the same grid argument as [[LangModel]]: `ln` is the one
  * engine-approximate op, and the 1e-6 floor grid vs ~1e-16 relative ulp
  * error makes a cross-engine flip astronomically unlikely.
  *
  * Scale shape (100 TB corpus, config-sized model):
  * - Training is ONE map-side-combined `groupBy(token)` over the exploded
  *   labeled slice (the two class counts are conditional aggregates of
  *   the same pass — not two jobs).
  * - Scoring is one explode + ONE equi-join on the token + one
  *   integer-sum `groupBy(doc)` — or zero shuffles via
  *   [[scoreQualityBroadcast]] when the pruned weight table fits executor
  *   memory (the common case; `minCount` pruning bounds it).
  * - Counts are ADDITIVE: [[updateCounts]] folds a new labeled batch into
  *   a persisted model without re-reading the old reference — the same
  *   raw-table-plus-view discipline as [[LangModel.updateModel]] (prune
  *   at scoring time, never in the persisted artifact).
  *
  * Reference scope: the reference ships no content-quality operator (its
  * filters are namespace/field predicates, monstache.go:1110-1180); this
  * is part of the LLM-curation layer the port adds on top.
  */
object QualityModel {

  /** Per-token class counts from a labeled corpus: `(token, n_pos,
    * n_neg)`. `labelCol` is boolean (true = positive class); a NULL label
    * counts toward neither class (both engines' conditional counts skip
    * nulls). One shuffle, map-side combined. */
  def tokenClassCounts(labeled: DataFrame, labelCol: String = "label",
                       textCol: String = "text"): DataFrame =
    labeled
      .select(col(labelCol).as("label"),
        explode(TextHash.words(col(textCol))).as("token"))
      .groupBy("token")
      .agg(count(when(col("label"), 1)).as("n_pos"),
        count(when(!col("label"), 1)).as("n_neg"))

  /** Fold a new labeled batch into existing counts: counts are additive,
    * so `updateCounts(tokenClassCounts(b1), b2) ≡ tokenClassCounts(b1 ∪
    * b2)` (pinned by QualityModelSpec) — the daily-ingest shape where the
    * labeled reference is never re-read. The invariant only holds for
    * UNPRUNED counts (a `minCount` threshold is not additive — see
    * [[LangModel.updateModel]] for the argument); persist raw counts and
    * prune at scoring time. */
  def updateCounts(existing: DataFrame, newLabeled: DataFrame,
                   labelCol: String = "label",
                   textCol: String = "text"): DataFrame =
    existing.unionByName(tokenClassCounts(newLabeled, labelCol, textCol))
      .groupBy("token")
      .agg(sum(col("n_pos")).as("n_pos"), sum(col("n_neg")).as("n_neg"))

  /** Persist / reopen the count table (the run-over-run artifact). */
  def writeCounts(counts: DataFrame, dir: String): Unit =
    counts.write.mode("overwrite").parquet(dir)
  def readCounts(spark: org.apache.spark.sql.SparkSession,
                 dir: String): DataFrame = spark.read.parquet(dir)

  /** The micro-nat weight of one smoothed probability side:
    * `floor(1e6 · ln((n+1)/(tot+V)))` as a long. */
  private def sideMicro(n: Column, tot: Column, v: Column): Column =
    floor(lit(1e6) * log((coalesce(n, lit(0L)) + 1).cast("double")
      / (tot + v))).cast("long")

  /** Score documents against trained counts — the join path (the
    * doesn't-fit fallback; [[scoreQualityBroadcast]] is the 100 TB
    * default). Output per doc: `n_tokens`, `n_oov` (tokens unseen in
    * either class), `q_micro` (integer micro-nat log-odds sum), and
    * `keep = q_micro > 0` (more likely positive than negative under the
    * balanced-prior convention). Empty / null-text docs score
    * `(0, 0, 0, false)` — explode_outer keeps their row. */
  def scoreQuality(docs: DataFrame, counts: DataFrame,
                   idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    // persisted: the count lineage is consumed TWICE (the totals
    // aggregate and the scoring join) — unpersisted, freshly-trained
    // counts would re-run the labeled-corpus aggregation for the totals
    // row. Registered with CacheBarriers so sessions can release it —
    // the same contract as LangModel.scoreDocs' unigram barrier.
    val cnt = graft.CacheBarriers.barrier(counts)
    val tot = cnt.agg(sum(col("n_pos")).as("tot_pos"),
      sum(col("n_neg")).as("tot_neg"),
      count(lit(1)).as("vocab_v"))
    // assert_true fires before the arithmetic: empty counts make both
    // smoothing denominators V = 0 → ln(Inf) garbage with no hint of the
    // cause. Loud beats silently-Inf (same guard as LangModel.scoreDocs).
    val guarded = when(
      assert_true(col("vocab_v") > 0,
        lit("QualityModel: empty count table (vocab_v = 0)")).isNull,
      sideMicro(col("n_pos"), col("tot_pos"), col("vocab_v")) -
        sideMicro(col("n_neg"), col("tot_neg"), col("vocab_v")))
    val exploded = docs.select(col(idCol),
      explode_outer(TextHash.words(col(textCol))).as("tok"))
    exploded
      .join(cnt, exploded("tok") === cnt("token"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("w",
        when(col("tok").isNull, lit(null).cast("long")).otherwise(guarded))
      .groupBy(idCol)
      .agg(count(col("tok")).as("n_tokens"),
        count(when(col("tok").isNotNull && col("token").isNull, 1))
          .as("n_oov"),
        coalesce(sum(col("w")), lit(0L)).as("q_micro"))
      .withColumn("keep", col("q_micro") > 0)
  }

  /** A driver-side weight snapshot for the broadcast scoring path: one
    * long per token (the two floors pre-subtracted) plus the shared OOV
    * weight — materially smaller than shipping both count columns. The
    * collect is licensed the same way as [[LangModel.collectModel]]: the
    * caller prunes with `minCount` first, which bounds the table by
    * construction (the corpus itself never moves). */
  case class LocalClassifier(weights: Map[String, Long], oovWeight: Long,
                             vocabV: Long)

  /** Collect trained counts into a [[LocalClassifier]]. `minCount` prunes
    * the singleton tail (`n_pos + n_neg < minCount` drops to OOV) — the
    * scoring-time threshold the additive persisted artifact defers. */
  def collectClassifier(counts: DataFrame,
                        minCount: Int = 1): LocalClassifier = {
    val kept = counts.filter(col("n_pos") + col("n_neg") >= minCount)
    val tot = counts.agg(sum(col("n_pos")), sum(col("n_neg")),
      count(lit(1))).head()
    require(!tot.isNullAt(2) && tot.getLong(2) > 0,
      "QualityModel: empty count table (vocab_v = 0)")
    val (totPos, totNeg, v) =
      (coalesce0(tot, 0), coalesce0(tot, 1), tot.getLong(2))
    def side(n: Long, t: Long): Long =
      math.floor(1e6 * math.log((n + 1).toDouble / (t + v))).toLong
    val ws = kept.select("token", "n_pos", "n_neg").collect()
      .map(r => r.getString(0) -> (side(r.getLong(1), totPos) -
        side(r.getLong(2), totNeg))).toMap
    LocalClassifier(ws, side(0L, totPos) - side(0L, totNeg), v)
  }

  private def coalesce0(r: org.apache.spark.sql.Row, i: Int): Long =
    if (r.isNullAt(i)) 0L else r.getLong(i)

  /** Broadcast-weight scoring: the same numbers as [[scoreQuality]] with
    * NO shuffle — one narrow pass with per-row map lookups, the 100 TB
    * shape when the pruned table fits executor memory. NOTE: a
    * `minCount`-pruned classifier scores pruned tokens as OOV, so parity
    * with the join path holds at the same pruning on both sides (pinned
    * by QualityModelSpec at minCount = 1). Stateless and per-row, so it
    * runs unchanged under Structured Streaming (same contract as
    * [[LangModel.scoreDocsBroadcast]]). */
  def scoreQualityBroadcast(docs: DataFrame, model: LocalClassifier,
                            idCol: String = "doc_id",
                            textCol: String = "text"): DataFrame = {
    require(model.vocabV > 0,
      "QualityModel: empty count table (vocab_v = 0)")
    val spark = docs.sparkSession
    val bc = spark.sparkContext.broadcast(model)
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{BooleanType, LongType, StructField, StructType}
    // Row-based with an explicit schema: the id column keeps its INPUT
    // type — same argument as scoreDocsBroadcast (typed .as[...] would
    // force a cast that crashes on non-numeric ids).
    val outSchema = StructType(Seq(
      docs.schema(idCol),
      StructField("n_tokens", LongType, nullable = false),
      StructField("n_oov", LongType, nullable = false),
      StructField("q_micro", LongType, nullable = false),
      StructField("keep", BooleanType, nullable = false)))
    docs.select(col(idCol), col(textCol))
      .mapPartitions { it =>
        val m = bc.value
        it.map { row =>
          val text = if (row.isNullAt(1)) null else row.getString(1)
          val ws = TextHash.wordsScala(text)
          var q = 0L; var oov = 0L
          var i = 0
          while (i < ws.length) {
            m.weights.get(ws(i)) match {
              case Some(w) => q += w
              case None => q += m.oovWeight; oov += 1
            }
            i += 1
          }
          Row(row.get(0), ws.length.toLong, oov, q, q > 0)
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
      .toDF(idCol, "n_tokens", "n_oov", "q_micro", "keep")
  }

  /** [[scoreQualityBroadcast]]'s scoring appended IN PLACE: every input
    * column survives and `q_micro` (integer micro-nat log-odds) +
    * `model_keep` (`q_micro > 0`) ride along — the form a composite
    * filter stage needs ([[graft.llm.Curation]]'s model gate), where the
    * score-only frame would force a re-join on the id. Same zero-shuffle
    * narrow pass, same streaming-safe per-row contract. */
  def withQualityScore(docs: DataFrame, model: LocalClassifier,
                       textCol: String = "text"): DataFrame = {
    require(model.vocabV > 0,
      "QualityModel: empty count table (vocab_v = 0)")
    val spark = docs.sparkSession
    val bc = spark.sparkContext.broadcast(model)
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{BooleanType, LongType, StructField, StructType}
    val ti = docs.schema.fieldIndex(textCol)
    val outSchema = StructType(docs.schema.fields ++ Seq(
      StructField("q_micro", LongType, nullable = false),
      StructField("model_keep", BooleanType, nullable = false)))
    docs.mapPartitions { it =>
      val m = bc.value
      it.map { row =>
        val text = if (row.isNullAt(ti)) null else row.getString(ti)
        val ws = TextHash.wordsScala(text)
        var q = 0L
        var i = 0
        while (i < ws.length) {
          q += m.weights.getOrElse(ws(i), m.oovWeight)
          i += 1
        }
        Row.fromSeq(row.toSeq :+ q :+ (q > 0))
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  // ── DuckDB twins (same tokenization, same micro-floor math) ───────────

  /** SQL: token class counts CTE body over a `(label, text)` source —
    * `(token, n_pos, n_neg)`. */
  def sqlTokenClassCounts(src: String, textExpr: String = "text",
                          labelExpr: String = "label"): String =
    s"""SELECT token,
       | count(CASE WHEN $labelExpr THEN 1 END) AS n_pos,
       | count(CASE WHEN NOT $labelExpr THEN 1 END) AS n_neg
       | FROM (SELECT $labelExpr, unnest(${TextHash.sqlWords(textExpr)})
       |       AS token FROM $src)
       | GROUP BY token""".stripMargin.replaceAll("\n", "")

  /** SQL: the per-token micro-nat weight given joined `n_pos`, `n_neg`,
    * `tot_pos`, `tot_neg`, `vocab_v` columns — two separate floors, the
    * exactness contract above. */
  val sqlWeightMicro: String =
    """(CAST(floor(1e6 * ln(
      | CAST(coalesce(n_pos, 0) + 1 AS DOUBLE) / (tot_pos + vocab_v)))
      | AS BIGINT)
      | - CAST(floor(1e6 * ln(
      | CAST(coalesce(n_neg, 0) + 1 AS DOUBLE) / (tot_neg + vocab_v)))
      | AS BIGINT))""".stripMargin.replaceAll("\n", "")
}
