package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Last-writer-wins upsert resolution (SURVEY §2.8 T4 + §2.9 K1/K2).
  *
  * The reference gets idempotent, order-free replay by letting Elasticsearch
  * enforce external versions per document (monstache.go:4053-4063, conflict
  * 409s ignored at 566-571). In Spark the same guarantee is a per-key
  * version-max reduction: for each id keep the op with the highest version;
  * delete ops carry +2 so a delete beats a same-instant update.
  *
  * Scale: one shuffle on the key. AQE handles skewed ids. For pure
  * "latest row" (no rank needed) `max_by(struct(...), version)` would be a
  * partial-aggregating alternative; `row_number` is used here because the
  * tie-break must be total (version, then arrival id) for determinism.
  */
object Upsert {

  /** Keep exactly the winning op per key, with deterministic tie-break. */
  def lastWriterWins(df: DataFrame, keyCol: String = "id",
                     versionCol: String = "version",
                     tieBreak: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(versionCol).desc, col(tieBreak).desc)
    df.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Final sink state: winners whose last op is not a delete. The companion
    * tombstone set is [[tombstones]]. Together they are what the reference's
    * ES index would hold after replaying the stream in any order. */
  def liveDocuments(df: DataFrame): DataFrame =
    lastWriterWins(df).filter(col("operation") =!= "d")

  /** Ids whose final op is a delete — the delete stream the sink must apply
    * (delete-strategy "stateless", monstache.go:4065-4147). */
  def tombstones(df: DataFrame): DataFrame =
    lastWriterWins(df).filter(col("operation") === "d")
}
