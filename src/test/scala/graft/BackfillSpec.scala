package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Upsert
import graft.source.ChangeEvent
import graft.streaming.StreamingUpsert

/** SURVEY §3.2's lifecycle, end to end: a direct-read backfill computes
  * the snapshot state, the change stream starts FROM the snapshot's
  * timestamp, and the two phases converge to exactly the state a single
  * batch pass over all ops would produce — the reference's initial-sync →
  * tail handoff (save resume ts after direct reads complete,
  * monstache.go:5248-5260, then tail from it). */
class BackfillSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def mkOps(n: Int): Seq[ChangeEvent] =
    (0 until n).map { i =>
      val id = (i % 23).toString
      val op = if (i % 11 == 0) "d" else if (i % 3 == 0) "i" else "u"
      ChangeEvent(i.toLong, id, "app", "t0", "app.t0", op,
        1000000L + i, (1000000L + i) * 4, s"""{"k":$i}""", i.toDouble, "oplog")
    }

  test("backfill state + stream-from-snapshot-ts converges to batch LWW") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ops = mkOps(500)
    val snapshotTs = 1000299L // backfill covers ops up to this cluster time
    val (snapshot, tail) = ops.partition(_.ts_us <= snapshotTs)

    // phase 1: direct-read backfill seeds the state (below batchId 0, so
    // the stream's first micro-batch merges AGAINST it, not over it)
    val stateDir = Files.createTempDirectory("graft-backfill-state").toString
    val ckptDir = Files.createTempDirectory("graft-backfill-ckpt").toString
    StreamingUpsert.seedState(snapshot.toDF(), stateDir)

    // phase 2: the stream carries only ops AFTER the snapshot timestamp
    // (the saved resume point) and merges into the same state
    val src = MemoryStream[ChangeEvent]
    src.addData(tail)
    StreamingUpsert.start(src.toDF(), stateDir, ckptDir).awaitTermination()

    val converged = StreamingUpsert.liveState(spark, stateDir)
      .select("id", "operation", "version")
      .as[(String, String, Long)].collect().toSet
    val batch = Upsert.liveDocuments(ops.toDF())
      .select("id", "operation", "version")
      .as[(String, String, Long)].collect().toSet
    assert(converged == batch && converged.nonEmpty)
  }

  test("seedState: snapshot-only keys survive the stream's FIRST batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // id "cold" is written ONLY by the backfill; the stream never touches
    // it. mergeBatch(_, 0) consults versions strictly below the batch id,
    // so this converges iff the seed landed below batchId 0 — a snapshot
    // written at v0 would be silently overwritten by the first micro-batch
    // and this assertion would catch it.
    val snapshot = Seq(
      ChangeEvent(0L, "cold", "app", "t0", "app.t0", "i",
        1000000L, 4000000L, """{"k":"cold"}""", 0.0, "oplog"),
      ChangeEvent(1L, "hot", "app", "t0", "app.t0", "i",
        1000001L, 4000004L, """{"k":0}""", 1.0, "oplog"))
    val tail = Seq(
      ChangeEvent(2L, "hot", "app", "t0", "app.t0", "u",
        1000002L, 4000008L, """{"k":1}""", 2.0, "oplog"))

    val stateDir = Files.createTempDirectory("graft-seed-state").toString
    val ckptDir = Files.createTempDirectory("graft-seed-ckpt").toString
    StreamingUpsert.seedState(snapshot.toDF(), stateDir)
    val src = MemoryStream[ChangeEvent]
    src.addData(tail)
    StreamingUpsert.start(src.toDF(), stateDir, ckptDir).awaitTermination()

    val live = StreamingUpsert.liveState(spark, stateDir)
      .select("id", "version").as[(String, Long)].collect().toMap
    assert(live == Map("cold" -> 4000000L, "hot" -> 4000008L))
  }

  test("overlap at the boundary is harmless (at-least-once replay)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ops = mkOps(300)
    val stateDir = Files.createTempDirectory("graft-backfill-state2").toString
    val ckptDir = Files.createTempDirectory("graft-backfill-ckpt2").toString
    // the stream replays 50 ops the backfill already covered — versions
    // make the re-merge idempotent, like the reference's replay semantics
    val (snapshot, _) = ops.splitAt(200)
    StreamingUpsert.seedState(snapshot.toDF(), stateDir)
    val src = MemoryStream[ChangeEvent]
    src.addData(ops.drop(150))
    StreamingUpsert.start(src.toDF(), stateDir, ckptDir).awaitTermination()
    val converged = StreamingUpsert.liveState(spark, stateDir)
      .select("id", "version").as[(String, Long)].collect().toSet
    val batch = Upsert.liveDocuments(ops.toDF())
      .select("id", "version").as[(String, Long)].collect().toSet
    assert(converged == batch)
  }
}
