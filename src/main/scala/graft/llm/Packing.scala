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

  /** Interleaved multimodal packing — the vision-language trainer's
    * budget accounting (LLaVA/Flamingo-style: an image enters the
    * sequence as its patch grid plus delimiter tokens, all charged
    * against the same context budget as text): a document's effective
    * length is `textTokens + patchTokens` (the caller derives patch
    * tokens from PARSED media metadata — [[graft.multimodal.Multimodal
    * .withImageDims]] → grid size + separators — so the plan moves one
    * metadata row per asset, never a media byte), and the pack
    * assignment is [[withPacksCounted]] verbatim: same salt, same
    * next-fit cumulative sum, same collision-audited id arithmetic,
    * documents atomic (an image's patches never split across packs).
    * Adds `text_tokens`, `patch_tokens` (0 for text-only docs),
    * `tokens`, `bucket`, `pack_id`. */
  def withInterleavedPacks(docs: DataFrame, budget: Int, nBuckets: Int,
                           textTokens: Column, patchTokens: Column,
                           idCol: String = "doc_id"): DataFrame =
    withPacksCounted(
      docs
        .withColumn("text_tokens", coalesce(textTokens.cast("long"), lit(0L)))
        .withColumn("patch_tokens",
          coalesce(patchTokens.cast("long"), lit(0L)))
        .withColumn("tokens", col("text_tokens") + col("patch_tokens")),
      budget, nBuckets, idCol)

  /** Per-pack modality split — [[packCensus]]'s vision-language sibling:
    * how much of each pack's budget is text vs patches, how many docs
    * carry an image, and the integer micro fill ratio against `budget`
    * (can exceed 1e6: next-fit keeps documents atomic, so a pack whose
    * last document straddles the boundary legitimately overflows — the
    * number the budget/patch-size trade is tuned on). */
  def modalityCensus(packed: DataFrame, budget: Int,
                     idCol: String = "doc_id"): DataFrame = {
    require(budget > 0, s"modalityCensus: budget=$budget must be positive")
    packed.groupBy("bucket", "pack_id")
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("patch_tokens") > 0, lit(1))).as("n_images"),
        sum(col("text_tokens")).as("text_tokens"),
        sum(col("patch_tokens")).as("patch_tokens"),
        sum(col("tokens")).as("tok_sum"),
        sum(col(idCol)).as("id_sum"))
      .withColumn("fill_micro",
        expr(s"tok_sum * 1000000L DIV ${budget}L"))
  }

  val BatchSalt = "graft-batch|"

  /** Per-(length-bucket, sub-stream) batch-index stride: 2^30 batches
    * per sub-stream before collision, with the combined
    * `(len_bucket · nSub + sub) · 2^30` id staying inside a positive
    * long for len_bucket·nSub up to 2^33 — far past any real
    * (max_len/width) × parallelism product (the [[PackStride]]
    * overflow-audit discipline). */
  val BatchStride: Long = 1L << 30

  /** Length-bucketed batch assignment — the DYNAMIC-BATCHING planner
    * (the padding complement of [[withPacksCounted]]'s next-fit
    * concatenation: packing fills a fixed budget by concatenation,
    * batching groups SEPARATE sequences and pays padding to the batch
    * max, the standard dataloader trade — Ott et al., fairseq 2019's
    * `--max-tokens` bucketing). Documents land in `len_bucket =
    * tokens DIV bucketWidth`, order longest-first (tokens DESC, id ASC
    * — the order that minimizes per-batch padding spread) inside
    * `nSub` salted sub-streams, and every `batchSize` consecutive docs
    * form one batch with a collision-free
    * `(len_bucket · nSub + sub) · 2^30 + idx` id.
    *
    * Scale shape: the only window partitions by (len_bucket, sub) — the
    * [[withPacksCounted]] salt trick, so a 100 TB corpus whose length
    * histogram piles into a few buckets still spreads each bucket over
    * `nSub` independent sort streams (pick ~10× cores); no global sort,
    * no single-reducer window. Determinism: assignment is a pure
    * function of (id, tokens), so the plan replays identically on any
    * cluster — the [[withPacks]] contract.
    *
    * Adds `len_bucket`, `sub`, `batch_id`. */
  def lengthBucketBatches(docs: DataFrame, bucketWidth: Int,
                          batchSize: Int, nSub: Int,
                          idCol: String = "doc_id"): DataFrame = {
    require(bucketWidth > 0, s"lengthBucketBatches: bucketWidth=$bucketWidth")
    require(batchSize > 0, s"lengthBucketBatches: batchSize=$batchSize")
    require(nSub > 0 && nSub <= (1 << 23),
      s"lengthBucketBatches: nSub=$nSub out of [1, 2^23]")
    val w = Window.partitionBy(col("len_bucket"), col("sub"))
      .orderBy(col("tokens").desc, col(idCol).asc)
    docs
      .withColumn("len_bucket", expr(s"tokens DIV $bucketWidth"))
      .withColumn("sub",
        TextHash.h32p(concat(lit(BatchSalt), col(idCol).cast("string")))
          % nSub)
      .withColumn("__rn", row_number().over(w))
      .withColumn("batch_id",
        (col("len_bucket") * nSub + col("sub")) * BatchStride +
          expr(s"(__rn - 1) DIV $batchSize"))
      .drop("__rn")
  }

  /** Per-batch padding census over a [[lengthBucketBatches]] assignment:
    * every sequence in a batch pads to the batch max, so
    * `pad_tokens = n_docs · batch_max − tok_sum` and `fill_micro` is
    * the batch's useful-token share — the report a dataloader audit
    * reads to size bucketWidth/batchSize (padding waste is pure
    * training-throughput loss). Exact integer arithmetic throughout. */
  def batchPadCensus(batched: DataFrame): DataFrame =
    batched.groupBy(col("len_bucket"), col("batch_id"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("tokens")).as("batch_max"),
        sum(col("tokens")).as("tok_sum"))
      .withColumn("pad_tokens",
        expr("n_docs * batch_max - tok_sum"))
      .withColumn("fill_micro",
        expr("tok_sum * 1000000L DIV greatest(n_docs * batch_max, 1L)"))

  /** Per-document TOKEN SPANS inside each pack — the sample-boundary
    * map a trainer consumes alongside [[withPacks]]' assignment:
    * documents concatenate within a pack in id order, so doc i occupies
    * `[start_tok, end_tok)` of its pack's sequence, and that map is
    * what drives document-boundary attention masking (no cross-document
    * attention inside packed sequences — the T5/LLaMA packing
    * discipline) and per-document loss masks. `doc_idx` is the doc's
    * 0-based position in its pack.
    *
    * Scale shape: one window partitioned by pack_id — pack-sized
    * partitions (a pack holds at most budget-worth of documents), so
    * the parallelism is the pack count; deterministic by the same
    * (pack, id-order) law as the assignment itself. */
  def packSpans(packed: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(col("pack_id")).orderBy(col(idCol))
    packed
      .withColumn("doc_idx",
        row_number().over(w).cast("long") - 1L)
      .withColumn("end_tok", sum(col("tokens")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("start_tok", col("end_tok") - col("tokens"))
      .select(col(idCol), col("bucket"), col("pack_id"), col("doc_idx"),
        col("start_tok"), col("end_tok"))
  }

  /** SQL twin of [[packSpans]] over a CTE holding [[sqlPacks]]' output. */
  def sqlPackSpans(packedSrc: String): String =
    s"""SELECT doc_id, bucket, pack_id,
       |       row_number() OVER (PARTITION BY pack_id ORDER BY doc_id)
       |         - 1 AS doc_idx,
       |       sum(tokens) OVER (PARTITION BY pack_id ORDER BY doc_id
       |                         ROWS UNBOUNDED PRECEDING)
       |         - tokens AS start_tok,
       |       sum(tokens) OVER (PARTITION BY pack_id ORDER BY doc_id
       |                         ROWS UNBOUNDED PRECEDING) AS end_tok
       |FROM $packedSrc""".stripMargin

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

  /** SQL twin of [[lengthBucketBatches]] + [[batchPadCensus]] over a
    * `(doc_id, tokens)` source CTE: same salt, same longest-first
    * order, same stride arithmetic, same integer padding census. */
  def sqlBatchPadCensus(src: String, bucketWidth: Int, batchSize: Int,
                        nSub: Int): String =
    s"""SELECT len_bucket, batch_id, count(*) AS n_docs,
       |       max(tokens) AS batch_max, sum(tokens) AS tok_sum,
       |       count(*) * max(tokens) - sum(tokens) AS pad_tokens,
       |       sum(tokens) * 1000000 //
       |         greatest(count(*) * max(tokens), 1) AS fill_micro
       |FROM (
       |  SELECT len_bucket, sub,
       |         (len_bucket * $nSub + sub) * $BatchStride +
       |           (row_number() OVER (PARTITION BY len_bucket, sub
       |              ORDER BY tokens DESC, doc_id ASC) - 1) // $batchSize
       |           AS batch_id,
       |         tokens
       |  FROM (SELECT doc_id, tokens, tokens // $bucketWidth AS len_bucket,
       |               (${TextHash.sqlH32p(
      s"concat('$BatchSalt', CAST(doc_id AS VARCHAR))")} % $nSub) AS sub
       |        FROM $src))
       |GROUP BY len_bucket, batch_id""".stripMargin
}
