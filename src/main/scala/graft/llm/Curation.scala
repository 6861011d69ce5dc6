package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end curation composite: quality/language gate → exact
  * dedup → near-dup cluster drop — the pipeline a pretraining corpus
  * actually runs, as one library call (each stage is the already-verified
  * operator; the composite's value is that the stages COMPOSE). q62
  * pins it against a full cross-engine replay.
  *
  * Plan shape: the gate is narrow; exact dedup is one shuffle on
  * `md5(text)`. TWO barriers: the gated+hashed frame is persisted
  * (it feeds both the representative aggregation and the semi-join
  * probe — and when the INPUT is itself a pipeline, like the
  * line-dedup chain in q83, re-evaluating it doubles the whole
  * upstream cost: measured 5.7 s → 3.1 s there); and the survivor set
  * is persisted and feeds both the LSH signature build and the final
  * anti-join. Near-dup clustering runs on the (small) verified pair
  * set, never the corpus. The drop side of both
  * anti-joins is duplicate-sized, so AQE broadcasts it here and
  * co-shuffles at scale.
  */
object Curation {

  /** Returns the kept corpus: (doc_id, text, pred_lang, n_words,
    * quality_bucket) for every document that passes the length gate, is
    * its content-hash group's representative, and is its near-dup
    * cluster's representative. */
  def curate(docs: DataFrame, idCol: String = "doc_id",
             textCol: String = "text"): DataFrame = {
    // stage 1: per-doc signals, gate out too-short docs (narrow)
    val gated = TextAnalysis.withQuality(
        TextAnalysis.withLangId(docs, textCol), textCol)
      .filter(col("quality_bucket") =!= "too_short")
      .select(col(idCol), col(textCol), col("pred_lang"), col("n_words"),
        col("quality_bucket"))
    // stage 2: exact dedup — each content hash keeps its min id. The
    // null-SAFE join is load-bearing: md5(null text) is NULL, groupBy
    // collects the NULL group and elects its representative, but an
    // equi-join would never match the NULL key back — silently dropping
    // every null-text document including the group's own winner
    // (exactDupGroups and lineDedup both keep NULL text in-contract)
    // both barriers register with CacheBarriers so a long-lived session
    // can release them after consuming the curated frame
    val hashed = graft.CacheBarriers.barrier(
      gated.withColumn("th", md5(col(textCol))))
    val reps = hashed.groupBy("th").agg(min(col(idCol)).as("rep_id"))
    val exactKept = graft.CacheBarriers.barrier(
      hashed.join(reps,
          hashed("th") <=> reps("th") && hashed(idCol) === reps("rep_id"),
          "left_semi")
        .drop("th"))
    // stage 3: near-dup clusters over the survivors; only cluster
    // representatives (min id) survive
    val drops = Dedup.dupClusters(
        Dedup.verifiedNearDupPairs(exactKept, idCol, textCol))
      .filter(!col("is_rep")).select(col("doc_id").as(idCol))
    exactKept.join(drops, Seq(idCol), "left_anti")
  }

  /** Per-source quality census — the domain-filtering stage (RefinedWeb /
    * C4-style): aggregate each source's quality-bucket counts and decide
    * per source whether it survives. A source is kept when it has at
    * least `minDocs` documents and at least half of them are `fluent`
    * (both in exact integer form — `2·n_fluent ≥ n_docs` — so the verdict
    * hashes identically cross-engine).
    *
    * Scale shape: one partial-aggregated groupBy on the source key
    * (sources number in the millions at web scale — still tiny next to
    * documents); the census is the broadcast side of [[sourceGate]]'s
    * filter join. */
  def sourceStats(docs: DataFrame, sourceCol: String = "source",
                  textCol: String = "text",
                  minDocs: Int = 10): DataFrame =
    TextAnalysis.withQuality(docs, textCol)
      .groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("quality_bucket") === "fluent", 1L).otherwise(0L))
          .as("n_fluent"),
        sum(when(col("quality_bucket") === "too_short", 1L).otherwise(0L))
          .as("n_short"))
      .withColumn("kept",
        col("n_docs") >= minDocs && lit(2) * col("n_fluent") >= col("n_docs"))

  /** Drop every document of a rejected source. Two passes over the input
    * (stats, then filter) — at corpus scale the census is computed once,
    * persisted with the corpus snapshot, and reused by every downstream
    * run, exactly like the dedup signature table. The kept-source list is
    * source-count-sized, so the semi-join broadcasts. */
  def sourceGate(docs: DataFrame, sourceCol: String = "source",
                 textCol: String = "text",
                 minDocs: Int = 10): DataFrame =
    docs.join(
      sourceStats(docs, sourceCol, textCol, minDocs)
        .filter(col("kept")).select(sourceCol),
      Seq(sourceCol), "left_semi")
}
