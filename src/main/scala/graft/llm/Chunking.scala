package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic document chunking: each document's word stream split
  * into fixed-size overlapping windows — the prep step for documents
  * longer than a training context (pretraining windows, retrieval
  * chunks), sitting between curation and packing. Chunk identity is a
  * pure function of the document (`(doc_id, chunk_idx)`), so re-runs
  * and replays produce identical chunks on any cluster.
  *
  * Window schedule: starts at `0, stride, 2·stride, …` while a full
  * window still begins inside the document; the final window clips at
  * the end (shorter tail rather than padding — padding is a
  * tokenizer-level concern). A document shorter than `chunkWords` is
  * one whole-document chunk; an empty text is one empty chunk (the row
  * is not lost); a NULL text yields no chunks (the standard quarantine
  * contract — nothing downstream can train on it).
  *
  * Scale shape: strictly narrow — words + a generated index sequence +
  * explode, all row-local, no shuffle anywhere. Output is ~`n/stride`
  * rows per document; provenance (`doc_id`, `chunk_idx`) rides every
  * row so dedup/decontamination can attribute chunks back to
  * sources. */
object Chunking {

  def withChunks(docs: DataFrame, chunkWords: Int, strideWords: Int,
                 idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    require(chunkWords > 0, s"chunkWords must be positive, got $chunkWords")
    require(strideWords > 0 && strideWords <= chunkWords,
      s"strideWords must be in [1, chunkWords], got $strideWords")
    val withWords = docs.withColumn("__ws", TextHash.words(col(textCol)))
    // The NULL branch is explicit: under spark.sql.legacy.sizeOfNull=true
    // (vanilla non-ANSI sessions) size(NULL) is -1 — NOT NULL — so the
    // isNotNull guard below would see -1 and fabricate one phantom chunk
    // for a NULL text. GraftSession sets the flag to false, but the
    // quarantine contract must hold on any session.
    val n = when(col("__ws").isNull, lit(null).cast("int"))
      .otherwise(size(col("__ws")))
    // integer ceil((n - N)/S) via floor — the double division is exact
    // at word-count magnitudes (see Quantiles.binThresholds)
    // the second branch is when(isNotNull, 1), NOT otherwise(1): a NULL
    // text has a NULL word array, and `otherwise` would catch it and
    // fabricate one null chunk — the null must propagate into the
    // sequence so explode drops the row (the quarantine contract)
    val nChunks = when(n > chunkWords,
      lit(1) + floor((n - chunkWords + strideWords - 1)
        / lit(strideWords.toDouble)).cast("int"))
      .when(n.isNotNull, lit(1))
    val window = slice(col("__ws"), col("chunk_idx") * strideWords + 1,
      lit(chunkWords))
    withWords
      .withColumn("chunk_idx", explode(sequence(lit(0), nChunks - 1)))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        array_join(window, " ").as("chunk_text"),
        size(window).cast("long").as("n_chunk_words"))
  }
}
