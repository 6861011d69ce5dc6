package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{Dedup, Similarity}
import graft.streaming.StreamingSemanticDedup

/** The durable streaming form of semantic dedup: bootstrap an index +
  * cluster artifact once, stream embedding batches against the chain
  * with checkpoint/resume, and the surviving artifact equals a
  * full-union rebuild — including a streamed vector BRIDGING two
  * bootstrap clusters. */
class StreamingSemanticDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def vec(theta: Double): Array[Double] =
    Array(math.cos(theta), math.sin(theta))

  private val theta = math.acos(0.999)
  private val minCos = 0.9975

  // bootstrap: clusters {1,2} and {3,4}, 3θ apart at the nearest ends
  private def b1 = {
    import spark.implicits._
    Seq((1L, vec(0)), (2L, vec(theta)),
      (3L, vec(4 * theta)), (4L, vec(5 * theta)))
      .toDF("vec_id", "embedding")
  }
  // batch 2: 10 bridges both bootstrap clusters; 11 is a far singleton
  private val batch2 = Seq((10L, vec(2.5 * theta)), (11L, Array(0.0, -1.0)))
  // batch 3: 12 joins the merged cluster through 2 and 10
  private val batch3 = Seq((12L, vec(2 * theta)))

  private def pairsOf(vs: DataFrame) =
    Similarity.embeddingNearDupPairs(vs,
      centroidPred = col("vec_id") === 1L, minCos)

  test("streamed batches with checkpoint resume equal a full-union rebuild") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stateDir = Files.createTempDirectory("graft-ssd-state").toString
    val ckpt = Files.createTempDirectory("graft-ssd-ckpt").toString
    StreamingSemanticDedup.bootstrap(b1, stateDir,
      centroidPred = col("vec_id") === 1L, minCos)

    val s1 = MemoryStream[(Long, Array[Double])]
    s1.addData(batch2)
    StreamingSemanticDedup.start(s1.toDF().toDF("vec_id", "embedding"),
      stateDir, ckpt, minCos).awaitTermination()

    // "crash": a new query on the same checkpoint replays nothing of
    // batch2 and processes only batch3
    val s2 = MemoryStream[(Long, Array[Double])]
    s2.addData(batch2)
    s2.addData(batch3)
    StreamingSemanticDedup.start(s2.toDF().toDF("vec_id", "embedding"),
      stateDir, ckpt, minCos).awaitTermination()

    val union = b1.unionByName(
      (batch2 ++ batch3).toDF("vec_id", "embedding"))
    val fullArt = Dedup.dupClusters(pairsOf(union))
      .select("doc_id", "cluster_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val art = StreamingSemanticDedup.latestClusters(spark, stateDir)
      .getOrElse(fail("no committed clusters")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(art.toSeq == fullArt.toSeq)
    // the bridge and the late joiner both collapsed into cluster 1
    assert(art.toSeq == Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L),
      (10L, 1L), (12L, 1L)))

    // one decision row per ingested vector; keeps = reps + singletons
    val dec = StreamingSemanticDedup.allDecisions(spark, stateDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .sortBy(_._1)
    assert(dec.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L))
    assert(dec.filter(_._3).map(_._1).toSeq == Seq(1L, 3L, 11L))
  }

  test("a torn index append (data landed, manifest did not) heals on replay") {
    import spark.implicits._
    val stateDir = Files.createTempDirectory("graft-ssd-state3").toString
    StreamingSemanticDedup.bootstrap(b1, stateDir,
      centroidPred = col("vec_id") === 1L, minCos)
    // simulate mergeBatch crashing INSIDE appendToIndex: artifact dirs
    // written, index DATA appended, `_ids` manifest NOT updated
    val batch = batch2.toDF("vec_id", "embedding")
    batch.write.mode("overwrite")
      .parquet(s"$stateDir/decisions/b0") // placeholder attempt evidence
    batch.write.mode("overwrite").parquet(s"$stateDir/v0/clusters")
    graft.llm.Similarity.ivfAssign(batch,
        graft.llm.Similarity.readCentroids(spark, s"$stateDir/index"),
        "vec_id", "embedding")
      .write.mode("append").partitionBy("bucket")
      .parquet(s"$stateDir/index")
    // the checkpoint replays batch 0; without the manifest rebuild the
    // anti-join would re-admit the landed rows as duplicates
    StreamingSemanticDedup.mergeBatch(batch, 0L, stateDir, minCos)
    val ids = spark.read.parquet(s"$stateDir/index")
      .select("vec_id").collect().map(_.getLong(0))
    assert(ids.length == ids.distinct.length,
      s"duplicate index rows after torn-append replay: ${ids.sorted.toSeq}")
    assert(ids.toSet == Set(1L, 2L, 3L, 4L, 10L, 11L))
  }

  test("a replayed micro-batch converges to the same state") {
    import spark.implicits._
    val stateDir = Files.createTempDirectory("graft-ssd-state2").toString
    StreamingSemanticDedup.bootstrap(b1, stateDir,
      centroidPred = col("vec_id") === 1L, minCos)
    StreamingSemanticDedup.mergeBatch(
      batch2.toDF("vec_id", "embedding"), 0L, stateDir, minCos)
    def snapshot() = (
      StreamingSemanticDedup.latestClusters(spark, stateDir).get
        .collect().map(_.toSeq).toSet,
      StreamingSemanticDedup.allDecisions(spark, stateDir)
        .collect().map(_.toSeq).toSet)
    val before = snapshot()
    // crash-after-index-append replay: the batch is already in the
    // index (appendToIndex is manifest-idempotent) and re-decided —
    // the self/batch-mate pairs it now sees through the index are CC
    // no-ops (see the StreamingSemanticDedup doc)
    StreamingSemanticDedup.mergeBatch(
      batch2.toDF("vec_id", "embedding"), 0L, stateDir, minCos)
    assert(snapshot() == before)
  }
}
