package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.codec.Codecs

/** Index-name / routing metadata resolution (SURVEY §2.3 P3-P4, §2.9 K7).
  *
  * Precedence in the reference: per-doc `_meta_monstache` override
  * (monstache.go:3547-3594) > per-namespace `[[mapping]]` override
  * (802-813) > lowercased namespace (795-800). Version defaults to the
  * cluster-time version with "external" semantics (1377-1403).
  *
  * Expressed as computed columns so the whole resolution is codegen'd and
  * the sink writer is a dumb consumer of `meta_*` columns.
  */
object Routing {

  /** namespace → index overrides, the `[[mapping]]` table. */
  def resolveIndex(nsMapping: Map[String, String],
                   docOverride: Option[Column] = None): Column = {
    val mapped = nsMapping.foldLeft(lit(null).cast("string")) {
      case (acc, (ns, idx)) => when(col("namespace") === ns, idx).otherwise(acc)
    }
    coalesce(
      docOverride.getOrElse(lit(null).cast("string")),
      mapped,
      Codecs.defaultIndexName(col("namespace")))
  }

  /** Attach meta_index / meta_id / meta_routing / meta_version columns.
    * Routing defaults to the doc id (what ES does); a custom routing column
    * mirrors the plugin's Routing override (monstachemap/plugin.go:33).
    *
    * Per-doc `m_meta_*` override columns (set by a [[TransformRegistry]]
    * mapper — the `_meta_monstache` analog, monstache.go:3547-3594) take
    * precedence over everything when present: doc override > ns `[[mapping]]`
    * override > default. */
  def withMeta(df: DataFrame, nsMapping: Map[String, String] = Map.empty,
               routing: Option[Column] = None): DataFrame = {
    def ov(name: String): Seq[Column] =
      if (df.columns.contains(name)) Seq(col(name)) else Seq.empty
    df.withColumn("meta_index",
        coalesce(ov("m_meta_index") :+ resolveIndex(nsMapping): _*))
      .withColumn("meta_id", coalesce(ov("m_meta_id") :+ col("id"): _*))
      .withColumn("meta_routing",
        coalesce(ov("m_meta_routing") :+ routing.getOrElse(col("id")): _*))
      .withColumn("meta_version",
        coalesce(ov("m_meta_version") :+ col("version"): _*))
      .withColumn("meta_version_type",
        coalesce(ov("m_meta_version_type") :+ lit("external"): _*))
      .filter(Codecs.idAccepted(col("id")))
  }
}
