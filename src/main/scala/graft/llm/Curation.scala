package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** The end-to-end curation composite: quality/language gate → exact
  * dedup → near-dup cluster drop — the pipeline a pretraining corpus
  * actually runs, as one library call (each stage is the already-verified
  * operator; the composite's value is that the stages COMPOSE). q62
  * pins it against a full cross-engine replay.
  *
  * Plan shape: the gate is narrow; exact dedup is one shuffle on
  * `md5(text)`; the survivor set is persisted ONCE and feeds both the
  * LSH signature build and the final anti-join (without the barrier the
  * whole gate+dedup lineage runs twice); near-dup clustering runs on the
  * (small) verified pair set, never the corpus. The drop side of both
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
    // stage 2: exact dedup — each content hash keeps its min id
    val hashed = gated.withColumn("th", md5(col(textCol)))
    val reps = hashed.groupBy("th").agg(min(col(idCol)).as(idCol))
    val exactKept = hashed.join(reps, Seq("th", idCol), "left_semi")
      .drop("th")
      .persist(StorageLevel.MEMORY_AND_DISK)
    // stage 3: near-dup clusters over the survivors; only cluster
    // representatives (min id) survive
    val drops = Dedup.dupClusters(
        Dedup.verifiedNearDupPairs(exactKept, idCol, textCol))
      .filter(!col("is_rep")).select(col("doc_id").as(idCol))
    exactKept.join(drops, Seq(idCol), "left_anti")
  }
}
