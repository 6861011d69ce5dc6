package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic output sharding for the pipeline's final write — the
  * stage that turns a curated corpus into the fixed set of training shards
  * a data loader consumes. Assignment keys off the same salted md5-prefix
  * hash as [[Sampling]] (never an RNG, never `spark_partition_id`): a
  * document's shard is a pure function of its id, so re-runs, backfills,
  * and incremental appends land every doc in the same shard regardless of
  * cluster size or input partitioning — which is what makes shard-level
  * resume ("re-write only shard 17") possible at 100 TB.
  *
  * The manifest is the write's verification artifact: per-shard doc count,
  * byte total, and id checksum. A loader (or the next pipeline run)
  * compares a recomputed manifest against the stored one to detect a
  * truncated or double-written shard without re-reading content.
  *
  * Scale shape: assignment is narrow; the manifest is one
  * partial-aggregated groupBy on the shard id (nShards rows out); the
  * writer's single shuffle is `repartition(shard)`, which makes each
  * output directory exactly one writer task's output instead of
  * nPartitions × nShards fragment files — small-file avoidance being the
  * operative constraint for a 100 TB corpus on object storage.
  */
object Sharding {

  val ShardSalt = "graft-shard|"

  /** Shard id 0..nShards-1 from the salted id hash. */
  def shardId(id: Column, nShards: Int): Column =
    TextHash.h32p(concat(lit(ShardSalt), id.cast("string"))) % nShards

  /** Attach the deterministic `shard` column. */
  def withShard(docs: DataFrame, nShards: Int,
                idCol: String = "doc_id"): DataFrame =
    docs.withColumn("shard", shardId(col(idCol), nShards))

  /** Per-shard manifest over a sharded frame: doc count, content byte
    * total, and the id checksum + range that pin exact membership (a
    * count alone cannot distinguish "right docs" from "right number of
    * wrong docs"). */
  def shardManifest(sharded: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame =
    sharded.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(octet_length(col(textCol))).as("byte_sum"),
        sum(col(idCol)).as("id_sum"),
        min(col(idCol)).as("min_id"),
        max(col(idCol)).as("max_id"))

  /** Write the corpus as `path/shard=N/` parquet directories (one writer
    * task per shard via the repartition) and return the manifest of what
    * was written, computed from a read-back of the files — the manifest
    * certifies the bytes on storage, not the frame that was supposed to
    * land there. */
  def writeShards(docs: DataFrame, path: String, nShards: Int,
                  idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    val sharded = withShard(docs, nShards, idCol)
    sharded.repartition(nShards, col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
    shardManifest(docs.sparkSession.read.parquet(path), idCol, textCol)
  }

  // ── DuckDB twin (same salt, same md5-prefix hash) ─────────────────────
  /** SQL: the shard id over an id expression. */
  def sqlShardId(id: String, nShards: Int): String =
    s"(${TextHash.sqlH32p(s"concat('$ShardSalt', CAST($id AS VARCHAR))")} % $nShards)"
}
