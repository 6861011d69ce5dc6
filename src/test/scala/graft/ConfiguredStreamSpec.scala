package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.config.{ConfiguredPipeline, GraftConfig}
import graft.operators.TransformRegistry
import graft.source.ChangeEvent
import graft.streaming.StreamingUpsert

/** The config file drives the DAEMON, not just batch plans: a TOML
  * config (namespace filter, mapping override, oplog-time injection)
  * assembles the streamed hot path, the backfill seeds the state through
  * the SAME hot path, and after the tail drains the state equals the
  * config-driven batch answer — the reference's full initial-sync → tail
  * lifecycle from one config. */
class ConfiguredStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val toml =
    """namespace-regex = "^app\\.keep$"
      |index-oplog-time = true
      |oplog-ts-field-name = "ots"
      |[[mapping]]
      |namespace = "app.keep"
      |index = "custom_index"
      |""".stripMargin

  private def mkOps(n: Int): Seq[ChangeEvent] =
    (0 until n).map { i =>
      val ns = if (i % 4 == 0) "app.noise" else "app.keep"
      val op = if (i % 17 == 0) "d" else if (i % 3 == 0) "i" else "u"
      ChangeEvent(i.toLong, (i % 13).toString, "app", ns.split("\\.")(1), ns,
        op, 1000000L + i, (1000000L + i) * 4, s"""{"k":$i}""", i.toDouble,
        "oplog")
    }

  test("TOML-configured backfill + stream converges to the batch answer") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val cfg = GraftConfig.fromToml(toml)
    val reg = TransformRegistry(mappers = Map(
      "" -> (df => df.withColumn("k",
        get_json_object(col("document"), "$.k").cast("int")))))
    val ops = mkOps(260)
    val (snapshot, tail) = ops.splitAt(130)

    val stateDir = Files.createTempDirectory("graft-cfgstream-state").toString
    val ckptDir = Files.createTempDirectory("graft-cfgstream-ckpt").toString
    // initial sync: the snapshot flows through the SAME configured hot
    // path before seeding (filters and meta must apply to backfill too)
    StreamingUpsert.seedState(
      ConfiguredPipeline.hotPath(cfg, reg)(snapshot.toDF()), stateDir)
    val src = MemoryStream[ChangeEvent]
    src.addData(tail)
    ConfiguredPipeline.startStream(cfg, reg)(src.toDF(), stateDir, ckptDir)
      .awaitTermination()

    val live = StreamingUpsert.liveState(spark, stateDir)
      .select("meta_index", "id", "version", "k", "ots")
      .as[(String, String, Long, Int, Long)].collect().toSet
    val batch = ConfiguredPipeline.indexedDocuments(cfg, reg)(ops.toDF())
      .select("meta_index", "id", "version", "k", "ots")
      .as[(String, String, Long, Int, Long)].collect().toSet
    assert(live == batch && live.nonEmpty)
    // the config did its three jobs: only app.keep survives, routed to
    // the mapping override, with the oplog-time column injected
    assert(live.forall(_._1 == "custom_index"))
    assert(live.forall(r => r._5 == r._3 / 4)) // ots = ts_us, version = ts_us*4
  }

  test("delete-strategy 2 streams identically to the batch answer") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // strategy 2 = ignore: a key whose final op is a delete KEEPS its
    // last data op. Without the strategy applied in the stream transform,
    // the tombstone would win LWW and liveState would drop the key.
    val cfg = GraftConfig.fromToml(
      "namespace-regex = \"^app\\\\.keep$\"\ndelete-strategy = 2")
    val ops = mkOps(120)
    assert(ops.exists(o => o.operation == "d" && o.namespace == "app.keep"))
    val stateDir = Files.createTempDirectory("graft-ds2-state").toString
    val ckptDir = Files.createTempDirectory("graft-ds2-ckpt").toString
    val src = MemoryStream[ChangeEvent]
    src.addData(ops)
    ConfiguredPipeline.startStream(cfg)(src.toDF(), stateDir, ckptDir)
      .awaitTermination()
    val live = StreamingUpsert.liveState(spark, stateDir)
      .select("id", "version").as[(String, Long)].collect().toSet
    val batch = ConfiguredPipeline.indexedDocuments(cfg)(ops.toDF())
      .select("id", "version").as[(String, Long)].collect().toSet
    assert(live == batch && live.nonEmpty)
  }

  test("index-as-update without mergeFields refuses to stream (no silent overwrite fall-through)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val cfg = GraftConfig.fromToml("index-as-update = true")
    val src = MemoryStream[ChangeEvent]
    val e = intercept[IllegalArgumentException](
      ConfiguredPipeline.startStream(cfg)(src.toDF(), "/tmp/x", "/tmp/y"))
    assert(e.getMessage.contains("mergeFields"))
    // with the field list it streams — StreamingIndexAsUpdateSpec proves
    // the streamed answer equals the batch one
  }

  test("the README lifecycle runs: directRead envelopes → seed → tail") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // the exact documented migration path, over the real testdata dir:
    // config-selected direct read (full envelopes), hot path, state seed,
    // then a change-stream tail that updates one key
    val cfg = GraftConfig.fromToml(
      """namespace-regex = "^app\\.region$"
        |direct-read-namespaces = ["app.region"]
        |""".stripMargin)
    val snapshot = ConfiguredPipeline
      .directRead(cfg, spark, "/root/testdata/sf0.001")
    val stateDir = Files.createTempDirectory("graft-readme-state").toString
    val ckptDir = Files.createTempDirectory("graft-readme-ckpt").toString
    StreamingUpsert.seedState(
      ConfiguredPipeline.hotPath(cfg)(snapshot), stateDir)
    val tail = Seq(ChangeEvent(1L, "0", "app", "region", "app.region", "u",
      2000000L, 8000000L, """{"r_name":"RENAMED"}""", 1.0, "oplog"))
    val src = MemoryStream[ChangeEvent]
    src.addData(tail)
    ConfiguredPipeline.startStream(cfg)(src.toDF(), stateDir, ckptDir)
      .awaitTermination()
    val live = StreamingUpsert.liveState(spark, stateDir)
      .select("id", "version", "document")
      .as[(String, Long, String)].collect()
    assert(live.length == 5) // all region rows survived the backfill
    val byId = live.map(r => r._1 -> r).toMap
    assert(byId("0")._2 == 8000000L && byId("0")._3.contains("RENAMED"))
    assert(byId("1")._2 == 0L && byId("1")._3.contains("r_name"))
  }
}
