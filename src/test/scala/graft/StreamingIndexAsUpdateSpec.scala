package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.config.{ConfiguredPipeline, GraftConfig}
import graft.operators.TransformRegistry
import graft.source.ChangeEvent
import graft.streaming.StreamingIndexAsUpdate

/** Streaming doc-as-upsert (K1 `index-as-update`): per key and per field
  * the latest NON-NULL value must survive partial updates ACROSS
  * micro-batches and restarts, and the converged state must equal the
  * batch [[ConfiguredPipeline.indexedDocuments]] answer over the same
  * ops — including tombstoned keys leaving the view. */
class StreamingIndexAsUpdateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val fields = Seq("a", "b")

  /** Ops whose documents carry DISJOINT field subsets — the shape
    * index-as-update exists for: {"a":_} updates must not erase b. */
  private def mkOps(n: Int): Seq[ChangeEvent] =
    (0 until n).map { i =>
      val id = (i % 13).toString
      val op = if (i % 19 == 0) "d" else if (i % 3 == 0) "i" else "u"
      val doc = (i % 3) match {
        case 0 => s"""{"a":$i}"""
        case 1 => s"""{"b":$i}"""
        case _ => s"""{"a":$i,"b":${i * 2}}"""
      }
      ChangeEvent(i.toLong, id, "app", "t0", "app.t0", op,
        1000000L + i, (1000000L + i) * 4, doc, i.toDouble, "oplog")
    }

  private val cfg = GraftConfig.fromToml(
    "namespace-regex = \"^app\\\\.t0$\"\nindex-as-update = true")
  private val reg = TransformRegistry(mappers = Map(
    "" -> (df => df
      .withColumn("a", get_json_object(col("document"), "$.a").cast("long"))
      .withColumn("b", get_json_object(col("document"), "$.b").cast("long")))))

  private def batchAnswer(ops: Seq[ChangeEvent]): Set[(String, Long, Long, Long)] = {
    import spark.implicits._
    canon(ConfiguredPipeline.indexedDocuments(cfg, reg, fields)(ops.toDF()))
  }

  private def canon(df: DataFrame): Set[(String, Long, Long, Long)] = {
    import spark.implicits._
    df.select(col("id"), coalesce(col("a"), lit(-1L)),
        coalesce(col("b"), lit(-1L)), col("merged_version"))
      .as[(String, Long, Long, Long)].collect().toSet
  }

  test("a delete fences earlier field values on both paths (no resurrection)") {
    import spark.implicits._
    import graft.operators.Upsert
    // k: i{a:1} → d → u{b:2} — the reference replays in order, so the
    // delete wipes a; only b survives. j: no delete, both fields merge.
    val df = Seq(
      ("k", "app.t0", "i", 10L, 1L, Option(1L), Option.empty[Long]),
      ("k", "app.t0", "d", 11L, 2L, Option.empty[Long], Option.empty[Long]),
      ("k", "app.t0", "u", 12L, 3L, Option.empty[Long], Option(2L)),
      ("j", "app.t0", "i", 10L, 4L, Option(7L), Option(8L)),
      ("j", "app.t0", "u", 11L, 5L, Option(9L), Option.empty[Long]))
      .toDF("id", "namespace", "operation", "version", "event_id", "a", "b")
    val expect = Map(
      "k" -> ((Option.empty[Long], Option(2L), 12L)),
      "j" -> ((Option(9L), Option(8L), 11L)))
    def canon(out: org.apache.spark.sql.DataFrame) =
      out.select("id", "a", "b", "merged_version")
        .as[(String, Option[Long], Option[Long], Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(canon(Upsert.indexAsUpdate(df, fields)) == expect)
    assert(canon(StreamingIndexAsUpdate.finish(
      StreamingIndexAsUpdate.partials(df, fields), fields)) == expect)
  }

  test("kill + resume converges to the batch doc-as-upsert answer") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ops = mkOps(400)
    assert(ops.exists(_.operation == "d"))
    val (firstHalf, secondHalf) = ops.splitAt(200)
    val stateDir = Files.createTempDirectory("graft-iau-state").toString
    val ckptDir = Files.createTempDirectory("graft-iau-ckpt").toString

    val s1 = MemoryStream[ChangeEvent]
    s1.addData(firstHalf)
    ConfiguredPipeline.startStream(cfg, reg)(s1.toDF(), stateDir, ckptDir,
      mergeFields = fields).awaitTermination()

    // the "crash": a NEW query on the same checkpoint skips the replayed
    // first half and processes only the remainder
    val s2 = MemoryStream[ChangeEvent]
    s2.addData(firstHalf)
    s2.addData(secondHalf)
    ConfiguredPipeline.startStream(cfg, reg)(s2.toDF(), stateDir, ckptDir,
      mergeFields = fields).awaitTermination()

    val streamed = StreamingIndexAsUpdate.mergedState(spark, stateDir, fields)
      .map(canon).getOrElse(fail("no committed state"))
    val batch = batchAnswer(ops)
    assert(streamed == batch && streamed.nonEmpty)
    // the mode's defining property actually holds in the answer: some key
    // merged its a and b from DIFFERENT ops (no single doc carries both
    // of its winning values)
    val both = streamed.filter(r => r._2 >= 0 && r._3 >= 0)
    assert(both.exists(r => r._3 != r._2 * 2))
  }

  test("replayed micro-batch merge is idempotent (at-least-once safe)") {
    import spark.implicits._
    val stateDir = Files.createTempDirectory("graft-iau-state2").toString
    val ops = mkOps(120)
    val hot: DataFrame = ConfiguredPipeline.hotPath(cfg, reg)(ops.toDF())
    val (b0, b1) = (hot.filter(col("event_id") < 60),
      hot.filter(col("event_id") >= 60))
    StreamingIndexAsUpdate.mergeBatch(b0, 0L, stateDir, fields)
    StreamingIndexAsUpdate.mergeBatch(b1, 1L, stateDir, fields)
    val once = StreamingIndexAsUpdate.mergedState(spark, stateDir, fields)
      .map(canon).get
    StreamingIndexAsUpdate.mergeBatch(b1, 1L, stateDir, fields)
    val twice = StreamingIndexAsUpdate.mergedState(spark, stateDir, fields)
      .map(canon).get
    assert(once == twice && once.nonEmpty)
    assert(once == batchAnswer(mkOps(120)))
  }

  test("a fresh checkpoint restarting batch ids under existing state is loud") {
    import spark.implicits._
    val stateDir = Files.createTempDirectory("graft-iau-state3").toString
    val hot = ConfiguredPipeline.hotPath(cfg, reg)(mkOps(60).toDF())
    StreamingIndexAsUpdate.mergeBatch(hot, 5L, stateDir, fields)
    val e = intercept[IllegalArgumentException](
      StreamingIndexAsUpdate.mergeBatch(hot, 0L, stateDir, fields))
    assert(e.getMessage.contains("further-progressed"))
  }

  test("state written under an older partial-row layout fails loudly") {
    import spark.implicits._
    val stateDir = Files.createTempDirectory("graft-iau-state5").toString
    // simulate a pre-marker (older-layout) state dir: a committed v0 with
    // no _layout marker — resuming must name the layout mismatch, not
    // surface a missing-column AnalysisException from combine
    Seq(("7", 1L)).toDF("id", "__iau_mv")
      .write.mode("overwrite").parquet(s"$stateDir/v0")
    val hot = ConfiguredPipeline.hotPath(cfg, reg)(mkOps(30).toDF())
    val e = intercept[IllegalStateException](
      StreamingIndexAsUpdate.mergeBatch(hot, 1L, stateDir, fields))
    assert(e.getMessage.contains("layout"))
    val e2 = intercept[IllegalStateException](
      StreamingIndexAsUpdate.mergedState(spark, stateDir, fields))
    assert(e2.getMessage.contains("layout"))
    // a CURRENT-layout dir stamps the marker on first merge and resumes
    val freshDir = Files.createTempDirectory("graft-iau-state6").toString
    StreamingIndexAsUpdate.mergeBatch(hot, 0L, freshDir, fields)
    StreamingIndexAsUpdate.mergeBatch(hot, 1L, freshDir, fields)
    assert(StreamingIndexAsUpdate.mergedState(spark, freshDir, fields).nonEmpty)
  }

  test("a key whose final op is a delete leaves the merged view") {
    import spark.implicits._
    val stateDir = Files.createTempDirectory("graft-iau-state4").toString
    val ops = Seq(
      ChangeEvent(0L, "7", "app", "t0", "app.t0", "i", 1000L, 4000L,
        """{"a":1}""", 0.0, "oplog"),
      ChangeEvent(1L, "7", "app", "t0", "app.t0", "u", 1001L, 4004L,
        """{"b":2}""", 0.0, "oplog"),
      ChangeEvent(2L, "8", "app", "t0", "app.t0", "i", 1002L, 4008L,
        """{"a":3}""", 0.0, "oplog"))
    val deletes = Seq(
      ChangeEvent(3L, "7", "app", "t0", "app.t0", "d", 1003L, 4012L,
        "{}", 0.0, "oplog"))
    val hot0 = ConfiguredPipeline.hotPath(cfg, reg)(ops.toDF())
    val hot1 = ConfiguredPipeline.hotPath(cfg, reg)(deletes.toDF())
    StreamingIndexAsUpdate.mergeBatch(hot0, 0L, stateDir, fields)
    // before the delete: key 7 merged a=1 (insert) with b=2 (update)
    val mid = StreamingIndexAsUpdate.mergedState(spark, stateDir, fields)
      .map(canon).get
    assert(mid.contains(("7", 1L, 2L, 4004L)))
    StreamingIndexAsUpdate.mergeBatch(hot1, 1L, stateDir, fields)
    val end = StreamingIndexAsUpdate.mergedState(spark, stateDir, fields)
      .map(canon).get
    assert(end.map(_._1) == Set("8"))
  }
}
