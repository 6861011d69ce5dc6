package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Sharding

/** The properties that make hash sharding a write contract rather than a
  * partitioning accident: determinism, partitioning independence,
  * append-stability, and a manifest that certifies the bytes on disk. */
class ShardingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = spark.range(0, 500)
    .select(col("id").as("doc_id"),
      concat(lit("doc body number "), col("id")).as("text"))

  test("shard assignment is deterministic, bounded, and partitioning-independent") {
    val a = Sharding.withShard(docs, 16).select("doc_id", "shard")
      .as[(Long, Long)].collect().toMap
    val b = Sharding.withShard(docs.repartition(7), 16)
      .select("doc_id", "shard").as[(Long, Long)].collect().toMap
    assert(a == b)
    assert(a.size == 500)
    assert(a.values.forall(s => s >= 0 && s < 16))
    // md5 spreads: no shard hoards the corpus
    val byShard = a.values.groupBy(identity).map(_._2.size)
    assert(byShard.max < 100)
  }

  test("a document's shard never moves when the corpus grows") {
    // incremental append must not reshuffle history: assignment is a pure
    // function of the id, so the first 100 docs shard identically whether
    // or not the other 400 exist
    val small = Sharding.withShard(docs.filter(col("doc_id") < 100), 16)
      .select("doc_id", "shard").as[(Long, Long)].collect().toMap
    val full = Sharding.withShard(docs, 16)
      .select("doc_id", "shard").as[(Long, Long)].collect().toMap
    assert(small.forall { case (id, s) => full(id) == s })
  }

  test("writeShards lands one directory per shard and certifies them") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shards")
      .toFile.getAbsolutePath
    val written = Sharding.writeShards(docs, dir, nShards = 8)
    val dirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("shard=")).map(_.getName).toSet
    assert(dirs == (0 until 8).map(s => s"shard=$s").toSet)
    // the read-back manifest matches the manifest of the input frame:
    // nothing truncated, nothing double-written
    val expected = Sharding.shardManifest(Sharding.withShard(docs, 8))
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(written.as[(Long, Long, Long, Long, Long, Long)]
      .collect().toSet == expected)
  }

  test("epoch order: reproducible per epoch, distinct across epochs") {
    val docs = spark.range(0, 500).select(col("id").as("doc_id"))
    def order(epoch: Int) = Sharding.withShuffleOrder(docs, epoch)
      .orderBy("order_key", "doc_id").select("doc_id")
      .as[Long].collect().toSeq
    val e0a = order(0)
    assert(e0a == order(0))              // replayable
    assert(e0a != order(1))              // epochs permute independently
    assert(e0a.toSet == order(1).toSet)  // …over the same membership
    assert(e0a != (0L until 500L).toSeq) // and it is actually shuffled
  }

  test("subSplits decouples write parallelism from nShards, same manifest") {
    val dir1 = java.nio.file.Files.createTempDirectory("graft-sub1").toString
    val dirN = java.nio.file.Files.createTempDirectory("graft-subN").toString
    val single = Sharding.writeShards(docs, dir1, nShards = 4)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    val split = Sharding.writeShards(docs, dirN, nShards = 4, subSplits = 4)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    // the certified contents are IDENTICAL — fragmentation is write-side
    assert(split == single && single.size == 4)
    // and the write actually fanned out: more part files than shards
    def partFiles(d: String) = {
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(d))
      try walk.filter(_.getFileName.toString.endsWith(".parquet"))
        .count().toInt
      finally walk.close()
    }
    assert(partFiles(dir1) == 4)
    assert(partFiles(dirN) > 4)
  }

  test("subSplits + epochOrder: fragment directories replay the epoch order") {
    val docs = spark.range(0, 400)
      .select(col("id").as("doc_id"), concat(lit("t"), col("id")).as("text"))
    val dir = java.nio.file.Files.createTempDirectory("graft-subord").toString
    Sharding.writeShards(docs, dir, nShards = 2, epochOrder = Some(1),
      subSplits = 4)
    (0 until 2).foreach { s =>
      // walking frag=0,1,… in ascending order must yield a fully sorted
      // order-key stream: frag boundaries ARE order-key range boundaries
      val frags = new java.io.File(s"$dir/shard=$s").listFiles()
        .filter(_.getName.startsWith("frag=")).map(_.getName).sorted
      assert(frags.length > 1, s"shard $s did not fragment")
      val keys = frags.flatMap { f =>
        spark.read.parquet(s"$dir/shard=$s/$f")
          .select("order_key").as[Long].collect()
      }.toSeq
      assert(keys == keys.sorted && keys.nonEmpty,
        s"shard $s fragments do not replay the epoch order")
    }
    // and the whole write still holds exactly the input membership
    val all = spark.read.parquet(dir).select("doc_id").as[Long]
      .collect().toSet
    assert(all == (0L until 400L).toSet)
  }

  test("writeShards with epochOrder lays each shard out in order") {
    val docs = spark.range(0, 300)
      .select(col("id").as("doc_id"), concat(lit("t"), col("id")).as("text"))
    val dir = java.nio.file.Files.createTempDirectory("graft-ord").toString
    Sharding.writeShards(docs, dir, nShards = 4, epochOrder = Some(2))
    // each shard directory's file order (row order as written) must be
    // ascending in the epoch key — what a sequential loader replays
    (0 until 4).foreach { s =>
      val keys = spark.read.parquet(s"$dir/shard=$s")
        .select("order_key").as[Long].collect().toSeq
      assert(keys == keys.sorted, s"shard $s not laid out in epoch order")
      assert(keys.nonEmpty)
    }
  }
}
