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
  val OrderSalt = "graft-order|"
  val FragSalt = "graft-frag|"

  /** Shard id 0..nShards-1 from the salted id hash. */
  def shardId(id: Column, nShards: Int): Column =
    TextHash.h32p(concat(lit(ShardSalt), id.cast("string"))) % nShards

  /** Attach the deterministic `shard` column. */
  def withShard(docs: DataFrame, nShards: Int,
                idCol: String = "doc_id"): DataFrame =
    docs.withColumn("shard", shardId(col(idCol), nShards))

  /** Deterministic training order: a pseudorandom-but-reproducible sort
    * key from the epoch-salted id hash. Training wants documents
    * shuffled (no source/time runs), but a 100 TB corpus cannot use an
    * RNG order — it would differ across re-runs, resumed writes, and
    * backfilled shards. Hashing (epoch, id) gives each epoch an
    * independent, replayable permutation: sort by `order_key` within a
    * shard and every re-run lays the same bytes in the same order.
    * Narrow per-row algebra; the sort rides the shard writer's existing
    * repartition as a sortWithinPartitions — no extra shuffle. */
  def orderKey(id: Column, epoch: Int = 0): Column =
    TextHash.h32p(
      concat(lit(OrderSalt), lit(epoch.toString), lit("|"),
        id.cast("string")))

  /** Attach the per-epoch `order_key` column. */
  def withShuffleOrder(docs: DataFrame, epoch: Int = 0,
                       idCol: String = "doc_id"): DataFrame =
    docs.withColumn("order_key", orderKey(col(idCol), epoch))

  /** Per-shard manifest over a sharded frame: doc count, content byte
    * total, and the id checksum + range that pin exact membership (a
    * count alone cannot distinguish "right docs" from "right number of
    * wrong docs"). */
  def shardManifest(sharded: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    // the id checksum is a SUM, so the contract is numeric ids — a loud
    // precondition here beats an ANSI cast error after the shards have
    // already been written (string/UUID ids: hash them to a long first)
    require(sharded.schema(idCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"shardManifest: id column '$idCol' must be numeric for the id_sum " +
        s"checksum; got ${sharded.schema(idCol).dataType.simpleString} — " +
        "hash non-numeric ids to a long first")
    sharded.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(octet_length(col(textCol))).as("byte_sum"),
        sum(col(idCol)).as("id_sum"),
        min(col(idCol)).as("min_id"),
        max(col(idCol)).as("max_id"))
  }

  /** Write the corpus as `path/shard=N/` parquet directories and return
    * the manifest of what was written, computed from a read-back of the
    * files — the manifest certifies the bytes on storage, not the frame
    * that was supposed to land there.
    *
    * `subSplits` decouples WRITE PARALLELISM from the shard count: the
    * default (1) writes one task per shard — the small-file optimum —
    * but when nShards ≪ cores (or one shard runs hot) that serializes
    * the write behind nShards tasks. With subSplits = s each shard
    * splits into s deterministic fragments (`shard=N/frag=M/`
    * directories), the repartition spreads nShards·s writer tasks, and
    * the manifest — grouped by shard — aggregates over fragments
    * unchanged. Fragment assignment is as deterministic as the shard's:
    * a salted id hash normally; the ORDER-KEY RANGE under `epochOrder`,
    * so fragment directories read in ascending `frag` replay the epoch
    * permutation exactly (frag boundaries are order-key boundaries — a
    * sequential loader walks shard=N/frag=0,1,… and sees a fully sorted
    * stream). `maxRecordsPerFile` composes on top for file-size caps. */
  def writeShards(docs: DataFrame, path: String, nShards: Int,
                  idCol: String = "doc_id",
                  textCol: String = "text",
                  epochOrder: Option[Int] = None,
                  subSplits: Int = 1): DataFrame = {
    require(subSplits >= 1 && subSplits <= 9999,
      s"subSplits must be in [1, 9999] (got $subSplits)")
    val sharded = withShard(docs, nShards, idCol)
    // h32p is 31-bit non-negative, so the range bucket is exact integer
    // algebra: frag f holds order keys in [f·2³¹/s, (f+1)·2³¹/s).
    // Fragment values are ZERO-PADDED to four digits: partition
    // directories sort lexicographically, and an unpadded frag=10 would
    // sort before frag=2 — silently scrambling the "walk frag dirs in
    // name order" loader contract the epoch path promises.
    def pad(c: Column): Column = format_string("%04d", c)
    def orderFrag: Column =
      pad(expr(s"(order_key * $subSplits) div 2147483648"))
    def hashFrag: Column =
      pad(TextHash.h32p(concat(lit(FragSalt), col(idCol).cast("string"))) %
        subSplits)
    val laidOut = (epochOrder, subSplits) match {
      // sortWithinPartitions after the shard repartition: the epoch's
      // deterministic order costs a per-task sort, never a new exchange.
      // The partition columns LEAD the sort keys: the dynamic-partition
      // writer REQUIRES an ordering on them and would insert its own
      // (unstable) sort — scrambling the epoch order — unless the
      // declared ordering already satisfies it.
      case (Some(epoch), 1) => withShuffleOrder(sharded, epoch, idCol)
        .repartition(nShards, col("shard"))
        .sortWithinPartitions(col("shard"), col("order_key"), col(idCol))
      case (None, 1) => sharded.repartition(nShards, col("shard"))
      case (Some(epoch), s) => withShuffleOrder(sharded, epoch, idCol)
        .withColumn("frag", orderFrag)
        .repartition(nShards * s, col("shard"), col("frag"))
        .sortWithinPartitions(col("shard"), col("frag"), col("order_key"),
          col(idCol))
      case (None, s) => sharded.withColumn("frag", hashFrag)
        .repartition(nShards * s, col("shard"), col("frag"))
        .sortWithinPartitions(col("shard"), col("frag"))
    }
    val partCols = if (subSplits == 1) Seq("shard") else Seq("shard", "frag")
    laidOut.write.mode("overwrite").partitionBy(partCols: _*).parquet(path)
    // partition-directory names read back as INT — re-cast to the LONG
    // withShard produces so manifest comparisons don't silently widen
    // (the same drift Similarity.readIndex pins for its bucket column)
    shardManifest(docs.sparkSession.read.parquet(path)
        .withColumn("shard", col("shard").cast("long")),
      idCol, textCol)
  }

  // ── DuckDB twin (same salt, same md5-prefix hash) ─────────────────────
  /** SQL: the shard id over an id expression. */
  def sqlShardId(id: String, nShards: Int): String =
    s"(${TextHash.sqlH32p(s"concat('$ShardSalt', CAST($id AS VARCHAR))")} % $nShards)"

  /** SQL: the epoch order key over an id expression. */
  def sqlOrderKey(id: String, epoch: Int = 0): String =
    TextHash.sqlH32p(
      s"concat('$OrderSalt', '$epoch', '|', CAST($id AS VARCHAR))")
}
