package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic span-corruption plan — the denoising-pretraining
  * batch plan (T5's span corruption, Raffel et al. JMLR 2020; SpanBERT,
  * Joshi et al. TACL 2020) in the repo's no-RNG discipline: the spans
  * a trainer masks are a pure FUNCTION of (doc_id, window), salted
  * through the shared [[TextHash.h32p]] family, so every worker, every
  * epoch, every engine derives the identical plan — reproducible runs
  * and an exactly replayable DuckDB oracle, where a sampled plan would
  * be unverifiable.
  *
  * Scheme (stated): tokens partition into fixed windows of
  * [[WindowTokens]]; every FULL window masks one span of [[SpanLen]]
  * tokens starting at `h32p(doc_id || ':' || window) mod 18` inside
  * the window — disjoint spans by construction, masked share =
  * 3/20 = 15 % of full-window tokens (the T5 default rate); the
  * ragged tail window masks nothing. Windowing by POSITION keeps the
  * plan stable under document append-only growth.
  *
  * Scale shape: one narrow pass — words, a bounded sequence explode
  * (n/20 spans per doc), per-row hash arithmetic; no shuffle
  * anywhere. The plan rows are what ships to the trainer alongside
  * [[Packing.packSpans]]' boundaries. */
object Masking {
  /** Window size in tokens. */
  val WindowTokens = 20
  /** Masked span length per full window. */
  val SpanLen = 3

  /** One row per planned span: `(id…, span_idx, start_tok (1-based),
    * len, masked)` — `masked` is the span's text, the trainer's
    * target sequence. Docs shorter than one window emit nothing. */
  def withMaskPlan(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    val working = Seq("span_idx", "start_tok", "len", "masked", "__ws",
      "__w")
    val clash = docs.columns.toSeq.intersect(working)
    require(clash.isEmpty, s"input columns ${clash.mkString(", ")} " +
      "collide with withMaskPlan working/output names — rename them")
    val span = WindowTokens - SpanLen + 1 // 18 start offsets
    docs
      .filter(col(textCol).isNotNull)
      .withColumn("__ws", TextHash.words(col(textCol)))
      .filter(size(col("__ws")) >= WindowTokens)
      .withColumn("__w", explode(sequence(lit(0L),
        expr(s"CAST(size(__ws) AS BIGINT) DIV $WindowTokens - 1"))))
      .withColumn("start_tok",
        col("__w") * WindowTokens +
          TextHash.h32p(concat(col(idCol).cast("string"), lit(":"),
            col("__w").cast("string"))) % span + 1)
      .select(col(idCol), col("__w").cast("long").as("span_idx"),
        col("start_tok").cast("long"),
        lit(SpanLen.toLong).as("len"),
        array_join(slice(col("__ws"), col("start_tok"), lit(SpanLen)),
          " ").as("masked"))
  }

  // ── DuckDB side (same hash family, same arithmetic) ───────────────────
  /** CTEs ending in `<out>(doc_id, span_idx, start_tok, len, masked)`
    * over `<src>(doc_id, ws)` (a words-list CTE). */
  def sqlMaskCtes(src: String, out: String): String = {
    val span = WindowTokens - SpanLen + 1
    val h = TextHash.sqlH32p(s"doc_id || ':' || w")
    s"""${out}w AS (
       |  SELECT doc_id, ws, unnest(range(0, len(ws) // $WindowTokens))
       |           AS w
       |  FROM $src WHERE len(ws) >= $WindowTokens),
       |${out}s AS (
       |  SELECT doc_id, w,
       |         w * $WindowTokens + ($h) % $span + 1 AS start_tok, ws
       |  FROM ${out}w),
       |$out AS (
       |  SELECT doc_id, w AS span_idx, start_tok, $SpanLen AS len,
       |         array_to_string(
       |           ws[start_tok : start_tok + ${SpanLen - 1}], ' ')
       |           AS masked
       |  FROM ${out}s)""".stripMargin
  }
}
