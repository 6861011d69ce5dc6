package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sequence packing: group documents into fixed token-budget
  * packs — the step between curation and training, where documents are
  * concatenated into model-context-length sequences. The assignment must
  * be a pure function of the corpus (same packs on every replay, on any
  * cluster) — so packing is next-fit over a deterministic order, not a
  * bin-packing heuristic over arrival order.
  *
  * Scale shape: docs are first scattered into `nBuckets` independent
  * streams by salted id hash, then packed within each bucket by a window
  * cumsum ordered by id. The window's partition key is the bucket, so at
  * 100 TB the packing parallelism is `nBuckets` (pick ~10× cores), each
  * partition sorts only its own slice — there is no global sort and no
  * single-reducer window (the classic window-function scale-killer this
  * design exists to avoid).
  *
  * Next-fit semantics: a document goes to pack `floor(tokens_before /
  * budget)` within its bucket; a pack may overflow the budget by at most
  * one document's tokens (the alternative — splitting documents across
  * packs — is a tokenizer-level concern, not a corpus-level one).
  */
object Packing {

  val PackSalt = "graft-pack|"

  /** Per-bucket pack-id stride. 2^40 packs per bucket before collision:
    * at a 256-token budget that is ~2.8e14 tokens PER BUCKET — far past
    * any single bucket's share of a 100 TB corpus (a 1e6-stride would
    * overflow at ~2.6e8 tokens/bucket, i.e. collide silently on the very
    * workload this operator claims). nBuckets up to 2^23 keeps
    * bucket·stride inside a positive long. */
  val PackStride: Long = 1L << 40

  /** Bucket + pack assignment: adds `tokens` (whitespace tokens),
    * `bucket`, and `pack_id` (unique across buckets). */
  def withPacks(docs: DataFrame, budget: Int, nBuckets: Int,
                idCol: String = "doc_id",
                textCol: String = "text"): DataFrame =
    withPacksCounted(
      docs
        // coalesce: a NULL text must count 0 tokens, not NULL — a NULL
        // here would null the cumsum difference and give the doc a NULL
        // pack_id (and the streaming twin, which counts 0, would
        // disagree)
        .withColumn("tokens",
          coalesce(size(TextHash.words(col(textCol))), lit(0))),
      budget, nBuckets, idCol)

  /** [[withPacks]] over a PRECOMPUTED `tokens` column — the path a real
    * tokenizer feeds (q125 packs by [[Bpe.withBpeTokens]] counts; the
    * whitespace count above is the model-free default). Same bucket
    * salt, same next-fit cumulative sum, same pack-id arithmetic. */
  def withPacksCounted(docs: DataFrame, budget: Int, nBuckets: Int,
                       idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy("bucket").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("bucket",
        TextHash.h32p(concat(lit(PackSalt), col(idCol).cast("string")))
          % nBuckets)
      .withColumn("__cum", sum(col("tokens")).over(w))
      .withColumn("pack_id",
        col("bucket") * PackStride + floor((col("__cum") - col("tokens")) / budget))
      .drop("__cum")
  }

  /** Pack census — the verifiable summary (per-pack doc count, token
    * total, id checksum) that pins the full assignment without emitting
    * every row. */
  def packCensus(packed: DataFrame, idCol: String = "doc_id"): DataFrame = {
    // same numeric-id contract as Sharding.shardManifest: the id_sum
    // checksum needs a sum, so non-numeric ids must be hashed first —
    // loudly, not as a late ANSI cast error
    require(packed.schema(idCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"packCensus: id column '$idCol' must be numeric for the id_sum " +
        s"checksum; got ${packed.schema(idCol).dataType.simpleString} — " +
        "hash non-numeric ids to a long first")
    packed.groupBy("bucket", "pack_id")
      .agg(count(lit(1)).as("n_docs"), sum(col("tokens")).as("tok_sum"),
        sum(col(idCol)).as("id_sum"))
  }

  // ── DuckDB twins ──────────────────────────────────────────────────────
  def sqlBucket(id: String, nBuckets: Int): String =
    s"(${TextHash.sqlH32p(s"concat('$PackSalt', CAST($id AS VARCHAR))")} % $nBuckets)"

  /** SQL: CTE body computing (doc_id, tokens, bucket, pack_id) from a
    * `(doc_id, text)` source CTE. */
  def sqlPacks(src: String, budget: Int, nBuckets: Int): String =
    s"""SELECT doc_id, tokens, bucket,
       |       bucket * $PackStride + CAST(floor(
       |         (sum(tokens) OVER (PARTITION BY bucket ORDER BY doc_id
       |                            ROWS UNBOUNDED PRECEDING) - tokens)
       |         / $budget) AS BIGINT) AS pack_id
       |FROM (SELECT doc_id, coalesce(len(${TextHash.sqlWords("text")}), 0) AS tokens,
       |             ${sqlBucket("doc_id", nBuckets)} AS bucket
       |      FROM $src)""".stripMargin

  /** SQL twin of [[withPacksCounted]]: same body over a `(doc_id,
    * tokens)` source CTE — the tokenizer-fed path. */
  def sqlPacksCounted(src: String, budget: Int, nBuckets: Int): String =
    s"""SELECT doc_id, tokens, bucket,
       |       bucket * $PackStride + CAST(floor(
       |         (sum(tokens) OVER (PARTITION BY bucket ORDER BY doc_id
       |                            ROWS UNBOUNDED PRECEDING) - tokens)
       |         / $budget) AS BIGINT) AS pack_id
       |FROM (SELECT doc_id, tokens,
       |             ${sqlBucket("doc_id", nBuckets)} AS bucket
       |      FROM $src)""".stripMargin
}
