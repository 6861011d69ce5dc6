package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._
import graft.queries._
import graft.source.EventLog

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `entry` is the reference's hot path (SURVEY §3.1) as one batch DAG:
  * change-stream envelope → namespace filter chain → mapper transform →
  * routing metadata → last-writer-wins upsert resolution → the "indexed"
  * document set a sink writer would bulk-flush.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The hot path is wired through the transform registry — the config
    * surface a reference user would actually program against. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val env = EventLog.envelope(spark, dir)
    val filtered = NamespaceFilter(env,
      NamespaceFilterConfig(include = Some("^app\\..*$")))
    val reg = TransformRegistry(
      mappers = Map(
        "" -> (df => df
          .withColumn("k", get_json_object(col("document"), "$.k").cast("int"))
          .withColumn("oplog_date",
            date_format(timestamp_micros(col("ts_us")),
              graft.codec.Codecs.DefaultOplogDateFormat)))))
    val routed = Routing.withMeta(reg(filtered), Map("app.t0" -> "users_primary"))
    Upsert.liveDocuments(routed)
      .select("meta_index", "meta_id", "meta_routing", "meta_version",
        "namespace", "operation", "k", "value", "oplog_date")
  }

  private val all: Seq[QueryDef] =
    CoreQueries.queries ++ RelateQueries.queries ++ LlmQueries.queries ++
      SourceQueries.queries

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** The same queries without verification-only presentation sorts —
    * the plans Bench times (see [[graft.queries.QueryDef]]). */
  def benchQueries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.bench).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
