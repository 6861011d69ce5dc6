package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.config.{ConfiguredPipeline, GraftConfig, Toml}
import graft.operators._
import graft.source.EventLog

/** The driver's t1 smoke gate, pinned locally: the flagship DAG returns
  * rows on sf0.001 and carries the sink metadata columns — plus the
  * config-file front door: the TOML-driven entry must equal the
  * hand-wired operator DAG exactly. */
class EntrySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("entry returns rows with resolved sink metadata (driver smoke)") {
    val df = SparkEntry.entry(spark)
    val cols = df.columns.toSet
    assert(Set("meta_index", "meta_id", "meta_routing", "meta_version")
      .subsetOf(cols))
    assert(df.count() > 0)
  }

  test("TOML fixture parses to the expected config") {
    val cfg = GraftConfig.loadResource("/graft.toml")
    assert(cfg.namespaceRegex.contains("^app\\..*$"))
    assert(cfg.indexOplogTime)
    assert(cfg.oplogDateFieldFormat == "2006/01/02 15:04:05")
    assert(cfg.mappings == Map("app.t0" -> "users_primary"))
  }

  test("config-driven entry equals the hand-wired DAG") {
    val dir = "/root/testdata/sf0.001"
    val env = EventLog.envelope(spark, dir)
    val handWired = {
      val filtered = NamespaceFilter(env,
        NamespaceFilterConfig(include = Some("^app\\..*$")))
      val reg = TransformRegistry(
        mappers = Map(
          "" -> (df => df
            .withColumn("k",
              get_json_object(col("document"), "$.k").cast("int"))
            .withColumn("oplog_ts", col("ts_us"))
            .withColumn("oplog_date",
              date_format(timestamp_micros(col("ts_us")),
                graft.codec.Codecs.DefaultOplogDateFormat)))))
      val routed = Routing.withMeta(reg(filtered),
        Map("app.t0" -> "users_primary"))
      Upsert.liveDocuments(routed)
        .select("meta_index", "meta_id", "meta_version", "namespace",
          "operation", "k", "oplog_date")
    }
    val fromConfig = SparkEntry.entry(spark)
      .select("meta_index", "meta_id", "meta_version", "namespace",
        "operation", "k", "oplog_date")
    assert(fromConfig.count() == handWired.count())
    assert(fromConfig.exceptAll(handWired).isEmpty &&
      handWired.exceptAll(fromConfig).isEmpty)
  }

  test("relate and delete-strategy config map onto operator settings") {
    val cfg = GraftConfig.fromToml(
      """namespace-regex = "^app\\..*$"   # data include
        |delete-strategy = 1
        |patch-namespaces = ["app.t1"]
        |time-machine-namespaces = ["app.t0", "app.t2"]
        |
        |[[relate]]
        |namespace = "app.orders"
        |with-namespace = "app.customer"
        |src-field = "o_custkey"
        |match-field = "c_custkey"
        |match-field-type = "objectId"
        |keep-src = true
        |max-depth = 3
        |
        |[[relate]]
        |namespace = "app.customer"
        |with-namespace = "app.nation"
        |src-field = "c_nationkey"
        |match-field = "n_nationkey"
        |""".stripMargin)
    assert(cfg.deleteStrategy == 1)
    assert(cfg.patchNamespaces == Seq("app.t1"))
    assert(cfg.timeMachineNamespaces == Seq("app.t0", "app.t2"))
    assert(cfg.relates == Seq(
      Relation("app.orders", "app.customer", "o_custkey", "c_custkey",
        keepSrc = true, maxDepth = 3, matchFieldType = Some("objectId")),
      Relation("app.customer", "app.nation", "c_nationkey", "n_nationkey")))
  }

  test("config drives relate fan-out, patch pairs, history, delete strategy") {
    val dir = "/root/testdata/sf0.001"
    val cfg = GraftConfig.fromToml(
      """delete-strategy = 2
        |patch-namespaces = ["app.t1"]
        |time-machine-namespaces = ["app.t0"]
        |time-machine-index-prefix = "hist"
        |time-machine-index-suffix = "2006.01"   # monthly indices (Go layout)
        |direct-read-namespaces = ["app.region", "app.nation"]
        |
        |[[relate]]
        |namespace = "app.orders"
        |with-namespace = "app.customer"
        |src-field = "o_custkey"
        |match-field = "c_custkey"
        |""".stripMargin)
    val env = EventLog.envelope(spark, dir)
    // relate graph from config == the same hand-built relation
    val seeds = Map("app.orders" ->
      spark.read.parquet(s"$dir/orders.parquet").filter(col("o_orderkey") % 50 === 0))
    val colls = Map("app.customer" -> spark.read.parquet(s"$dir/customer.parquet"))
    val fanned = ConfiguredPipeline.relateFanOut(cfg, spark, seeds, colls)
    val hand = Relate.fanOut(spark, seeds, colls,
      Seq(Relation("app.orders", "app.customer", "o_custkey", "c_custkey")))
    assert(fanned.count() == hand.count() && fanned.count() > 0)
    // patch pairs restricted to the configured namespace
    val pairs = ConfiguredPipeline.patchPairs(cfg)(env)
    assert(pairs.select("namespace").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("app.t1"))
    // history restricted + configured prefix and Go-layout suffix
    // (monthly "2006.01" → yyyy.MM)
    val hist = ConfiguredPipeline.history(cfg)(env)
    assert(hist.filter(
      !col("history_index").rlike("^hist\\.app\\.t0\\.\\d{4}\\.\\d{2}$"))
      .count() == 0)
    // delete-strategy 2 = ignore: no tombstones reach the live view
    val live = ConfiguredPipeline.indexedDocuments(cfg)(env)
    assert(live.filter(col("operation") === "d").count() == 0)
    // direct-read-namespaces: exactly the configured namespaces are read
    val dr = ConfiguredPipeline.directRead(cfg, spark, dir)
    assert(dr.select("namespace").distinct().collect()
      .map(_.getString(0)).toSet == Set("app.region", "app.nation"))
    // dynamic form: [""] discovers and the regex pair filters
    val dyn = cfg.copy(directReadNamespaces = Seq(""),
      directReadDynamicIncludeRegex = Some("^app\\.(region|nation)$"),
      directReadDynamicExcludeRegex = Some("^app\\.nation$"))
    val dynNs = ConfiguredPipeline.directRead(dyn, spark, dir)
      .select("namespace").distinct().collect().map(_.getString(0)).toSet
    assert(dynNs == Set("app.region"))
  }

  test("TOML parser rejects unsupported syntax loudly") {
    intercept[IllegalArgumentException] {
      Toml.parse("""key = 2024-01-01""") // dates are out of scope
    }
    intercept[IllegalArgumentException] {
      Toml.parse("""key = { inline = "table" }""")
    }
  }
}
