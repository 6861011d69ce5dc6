package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Upsert
import graft.streaming.BucketedState

/** Bucketed incremental state: parity with the global LWW path, replay
  * idempotence, and the scale property itself — untouched buckets are not
  * rewritten. */
class BucketedStateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mkOps(range: Range): Seq[(Long, String, String, Long)] =
    range.map { i =>
      val id = (i % 23).toString
      val op = if (i % 13 == 0) "d" else "u"
      (i.toLong, id, op, 1000L + i)
    }

  private def toDF(ops: Seq[(Long, String, String, Long)]) =
    ops.toDF("event_id", "id", "operation", "version")

  test("bucketed merge converges to the same state as a global LWW pass") {
    val dir = Files.createTempDirectory("graft-bstate").toString
    val all = mkOps(0 until 300)
    val (b0, rest) = all.splitAt(100)
    val (b1, b2) = rest.splitAt(100)
    BucketedState.mergeBatch(toDF(b0), 0L, dir, numBuckets = 8)
    BucketedState.mergeBatch(toDF(b1), 1L, dir, numBuckets = 8)
    BucketedState.mergeBatch(toDF(b2), 2L, dir, numBuckets = 8)
    val got = BucketedState.liveState(spark, dir)
      .select("id", "version").as[(String, Long)].collect().toSet
    val want = Upsert.liveDocuments(toDF(all))
      .select("id", "version").as[(String, Long)].collect().toSet
    assert(got == want && got.nonEmpty)
  }

  test("a different numBuckets against existing state is a loud error") {
    val dir = Files.createTempDirectory("graft-bstate-meta").toString
    BucketedState.mergeBatch(toDF(mkOps(0 until 50)), 0L, dir, numBuckets = 8)
    // silently accepting 4 would split each id's history across buckets
    val e = intercept[IllegalArgumentException](
      BucketedState.mergeBatch(toDF(mkOps(50 until 80)), 1L, dir,
        numBuckets = 4))
    assert(e.getMessage.contains("numBuckets=8"))
    // the pinned count still works
    BucketedState.mergeBatch(toDF(mkOps(50 until 80)), 1L, dir, numBuckets = 8)
    val got = BucketedState.liveState(spark, dir)
      .select("id", "version").as[(String, Long)].collect().toSet
    val want = Upsert.liveDocuments(toDF(mkOps(0 until 80)))
      .select("id", "version").as[(String, Long)].collect().toSet
    assert(got == want)
  }

  test("a fresh checkpoint restarting batch ids under existing state is a loud error") {
    // same guard as StreamingUpsert: b<N>/v0 written beneath a committed
    // v5 would be silently invisible to latestState (stale state
    // resurrected with no error anywhere)
    val dir = Files.createTempDirectory("graft-bstate-stale").toString
    BucketedState.mergeBatch(toDF(mkOps(0 until 50)), 5L, dir, numBuckets = 8)
    val e = intercept[IllegalArgumentException](
      BucketedState.mergeBatch(toDF(mkOps(0 until 50)), 0L, dir, numBuckets = 8))
    assert(e.getMessage.contains("newer than batch 0"))
    // the further-progressed id still merges fine
    BucketedState.mergeBatch(toDF(mkOps(50 until 80)), 6L, dir, numBuckets = 8)
  }

  test("a replayed batch is idempotent per bucket") {
    val dir = Files.createTempDirectory("graft-bstate2").toString
    val (b0, b1) = mkOps(0 until 200).splitAt(100)
    BucketedState.mergeBatch(toDF(b0), 0L, dir, numBuckets = 8)
    BucketedState.mergeBatch(toDF(b1), 1L, dir, numBuckets = 8)
    val once = BucketedState.liveState(spark, dir)
      .select("id", "version").as[(String, Long)].collect().toSet
    BucketedState.mergeBatch(toDF(b1), 1L, dir, numBuckets = 8) // crash replay
    val twice = BucketedState.liveState(spark, dir)
      .select("id", "version").as[(String, Long)].collect().toSet
    assert(once == twice)
  }

  test("untouched buckets are not rewritten (the scale property)") {
    val dir = Files.createTempDirectory("graft-bstate3").toString
    BucketedState.mergeBatch(toDF(mkOps(0 until 200)), 0L, dir, numBuckets = 8)
    // batch 1 touches exactly one id → at most one bucket gains a v1
    BucketedState.mergeBatch(
      toDF(Seq((999L, "7", "u", 99999L))), 1L, dir, numBuckets = 8)
    val root = new java.io.File(dir)
    val bucketsWithV1 = root.listFiles().filter(_.getName.startsWith("b"))
      .count(b => new java.io.File(b, "v1").exists())
    assert(bucketsWithV1 == 1)
    // and the touched id's winner is the new op
    val live = BucketedState.liveState(spark, dir)
      .select("id", "version").as[(String, Long)].collect().toMap
    assert(live("7") == 99999L)
  }

  test("compact: read identity, one file per bucket, replay still fenced") {
    val dir = Files.createTempDirectory("graft-bstate-compact").toString
    BucketedState.mergeBatch(toDF(mkOps(0 until 100)), 0L, dir, numBuckets = 4)
    BucketedState.mergeBatch(toDF(mkOps(100 until 200)), 1L, dir, numBuckets = 4)
    BucketedState.mergeBatch(toDF(mkOps(200 until 300)), 2L, dir, numBuckets = 4)
    val before = BucketedState.liveState(spark, dir)
      .select("id", "version").as[(String, Long)].collect().toSet

    // fence at 2: batch 2 may still replay, so its buckets keep their
    // crash window; batches 0/1 are durably committed
    BucketedState.compact(spark, dir, upToExcl = 2L)
    val root = new java.io.File(dir)
    val buckets = root.listFiles().filter(_.getName.startsWith("b"))
    buckets.foreach { b =>
      val vdirs = b.listFiles().filter(_.getName.matches("v\\d+"))
      if (vdirs.exists(_.getName == "v2")) {
        // latest at/beyond the fence: skipped whole, predecessor retained
        assert(vdirs.length >= 2, s"${b.getName}: crash window dropped")
      } else {
        // compacted: exactly one version, exactly one parquet part file
        assert(vdirs.length == 1, s"${b.getName}: superseded versions kept")
        val parts = vdirs.head.listFiles()
          .count(_.getName.endsWith(".parquet"))
        assert(parts == 1, s"${b.getName}: $parts part files after compact")
      }
    }
    assert(BucketedState.liveState(spark, dir)
      .select("id", "version").as[(String, Long)].collect().toSet == before,
      "compaction must not change what the store reads as")

    // a stopped-stream compaction (fence = max) compacts every bucket...
    BucketedState.compact(spark, dir)
    buckets.foreach { b =>
      val vdirs = b.listFiles().filter(_.getName.matches("v\\d+"))
      assert(vdirs.length == 1)
      assert(vdirs.head.listFiles().count(_.getName.endsWith(".parquet")) == 1)
    }
    assert(BucketedState.liveState(spark, dir)
      .select("id", "version").as[(String, Long)].collect().toSet == before)

    // ...and the stale-checkpoint replay guard still fires afterwards:
    // compaction preserves version ids, never renumbers
    val e = intercept[IllegalArgumentException](
      BucketedState.mergeBatch(toDF(mkOps(0 until 10)), 0L, dir,
        numBuckets = 4))
    assert(e.getMessage.contains("newer than batch 0"))

    // a leftover .old recovery copy fails the next compaction fast
    val victim = buckets.head
    val vdir = victim.listFiles().filter(_.getName.matches("v\\d+")).head
    val old = new java.io.File(victim, s".${vdir.getName}.old")
    assert(old.mkdir())
    val e2 = intercept[IllegalArgumentException](
      BucketedState.compact(spark, dir))
    assert(e2.getMessage.contains("crashed mid-swap"))
  }
}
