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
    * Driven by the checked-in TOML fixture (the reference's config
    * surface): namespace regex, oplog-time injection, and index mappings
    * come from the file; the one payload transform is a registry entry,
    * as the reference's scripts are. EntrySpec pins this against the
    * hand-wired DAG. */
  def entry(spark: SparkSession): DataFrame =
    entryDag(spark, "/root/testdata/sf0.001")

  /** The same flagship DAG over any SF dir — what q92 runs under the
    * oracle gate (T8 as a verified row, not just the driver smoke). */
  def entryDag(spark: SparkSession, dir: String): DataFrame = {
    val cfg = graft.config.GraftConfig.loadResource("/graft.toml")
    val reg = TransformRegistry(
      mappers = Map(
        "" -> (df => df
          .withColumn("k", get_json_object(col("document"), "$.k").cast("int")))))
    graft.config.ConfiguredPipeline
      .indexedDocuments(cfg, reg)(EventLog.envelope(spark, dir))
      .select("meta_index", "meta_id", "meta_routing", "meta_version",
        "namespace", "operation", "k", "value", "oplog_date")
  }

  /** The registry grouped by declaring file — [[OperatorsDoc]] renders
    * the operator map from this, so the map can't drift from the code. */
  def queryFamilies: Seq[(String, Seq[QueryDef])] = Seq(
    "src/main/scala/graft/queries/CoreQueries.scala" -> CoreQueries.queries,
    "src/main/scala/graft/queries/RelateQueries.scala" -> RelateQueries.queries,
    "src/main/scala/graft/queries/LlmQueries.scala" -> LlmQueries.queries,
    "src/main/scala/graft/queries/SourceQueries.scala" -> SourceQueries.queries)

  private val all: Seq[QueryDef] = queryFamilies.flatMap(_._2)

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
