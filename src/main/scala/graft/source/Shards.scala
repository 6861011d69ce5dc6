package graft.source

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sharded-cluster fan-in (SURVEY §2.1 S6) and per-stream resume tokens
  * (T2): the reference dials every shard listed in `config.shards`, starts
  * one tailer per shard, and hot-adds shards discovered while running
  * (dialShards monstache.go:4615-4633, one listener per shard 4913-4915,
  * AddShardListener 4328-4334). Resume state is kept *per stream id* in
  * `<configdb>.tokens` (nextTokens 4937-4946, saveTokens 1658-1687), so a
  * restart positions every shard's tailer independently.
  *
  * Spark shape: each shard is one envelope source tagged with its
  * `stream_id`; the merged stream is a `unionByName` — purely logical, no
  * shuffle, each shard's scan keeps its own partitions. A hot-added shard
  * is one more union member at the next plan. The token store is a
  * `groupBy(stream_id).agg(max(version))` — partial-aggregated map-side,
  * so saving tokens costs one tiny shuffle of one row per shard.
  */
object Shards {

  /** Tag one shard's envelope frame with its stream id (the reference's
    * per-shard `StreamID`, monstache.go:5092-5094). */
  def tagged(shard: DataFrame, streamId: String): DataFrame =
    shard.withColumn("stream_id", lit(streamId))

  /** S6 fan-in: the union of per-shard envelopes. Hot-adding a shard is
    * appending to `shards` and re-planning — exactly the reference's
    * shard-insert handler (makeShardInsertHandler, monstache.go:4328). */
  def fanIn(shards: Seq[(String, DataFrame)]): DataFrame = {
    // an empty shard list is a configuration error, not an empty union
    // (`Seq.reduce` would throw the opaque "empty.reduce" instead)
    require(shards.nonEmpty, "fanIn needs at least one shard")
    shards.map { case (sid, df) => tagged(df, sid) }
      .reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** T2 per-stream resume tokens over a fanned-in frame: the furthest
    * version each shard's tailer has processed, plus the op count — what
    * `saveTokens` persists every checkpoint tick. */
  def resumeTokens(merged: DataFrame): DataFrame =
    merged.groupBy("stream_id")
      .agg(max(col("version")).as("resume_token"),
        count(lit(1)).as("n_ops"))
}
