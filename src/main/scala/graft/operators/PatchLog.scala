package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** JSON merge-patch log (SURVEY §2.3 P10, monstache.go:3084-3158).
  *
  * The reference, for `patch-namespaces`, fetches the *previous* doc from
  * Elasticsearch on every update and appends an RFC-7386 merge patch to a
  * `json-merge-patches` array (v1 = the full doc on insert).
  *
  * Querying the sink per-op does not scale; the Spark re-expression derives
  * the previous version with a `lag()` window over (id, version) — one
  * shuffle, no sink round-trips — and numbers patches with `row_number()`.
  * The merge-patch diff itself is a pure function of (prev, curr) computed
  * by [[graft.codec.JsonMergePatch]] once the pairs exist.
  */
object PatchLog {

  /** (id, v, prev_document, document) pairs per patch-namespace doc,
    * v starting at 1 on the insert — prev is null there, matching the
    * reference storing the full doc as patch v1 (monstache.go:3138-3150).
    * Only data ops that CARRY a document participate: the reference's
    * addPatch runs downstream of routeData, which never routes a
    * data-less op — and the streaming twin
    * ([[graft.streaming.StreamingPatchLog]]) applies the same guard, so
    * the two logs stay op-for-op identical.
    *
    * Deletes FENCE the chain: in the reference a delete removes the sink
    * doc and its `json-merge-patches` array with it, so a re-insert
    * stores patch v1 = the full doc again (the insert branch,
    * monstache.go:3146-3156). Expressed as delete EPOCHS — a running
    * count of deletes splits each key's ops into chains that renumber
    * from 1 and never diff across a delete. */
  def pairs(df: DataFrame, namespaces: Seq[String],
            tieBreak: String = "event_id"): DataFrame = {
    // chains are per (namespace, id): several patch namespaces may reuse
    // ids, and interleaving them would diff unrelated documents
    val w = Window.partitionBy(col("namespace"), col("id"))
      .orderBy(col("version").asc, col(tieBreak).asc)
    val withEpoch = df.filter(col("namespace").isin(namespaces: _*))
      .filter((col("operation").isin("i", "u") && col("document").isNotNull)
        || col("operation") === "d")
      .withColumn("__epoch",
        sum(when(col("operation") === "d", 1).otherwise(0))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val wEpoch = Window
      .partitionBy(col("namespace"), col("id"), col("__epoch"))
      .orderBy(col("version").asc, col(tieBreak).asc)
    withEpoch.filter(col("operation").isin("i", "u"))
      .withColumn("v", row_number().over(wEpoch))
      .withColumn("prev_document", lag(col("document"), 1).over(wEpoch))
      .drop("__epoch")
  }
}
