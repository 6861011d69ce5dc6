package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A3/K5 flush-stats aggregation (`nextStats` monstache.go:4959-4972,
  * indexed by `doIndexStats` 3510-3527): per (namespace, operation)
  * counters over a slice of ops — one partially-aggregated groupBy, the
  * same definition the q15 oracle checks and the config front door
  * serves. `dated` adds the reference's daily stats-index name
  * (`monstache.stats.<yyyy-MM-dd>`, derived from the flush's own max
  * cluster time) for `index-stats = true`; plain `stats = true` only
  * logs, so the name column is omitted. */
object Stats {

  def bulkStats(df: DataFrame, dated: Boolean = true,
                statsIndexFormat: String = "monstache.stats.2006-01-02")
      : DataFrame = {
    val base = df.groupBy("namespace", "operation")
      .agg(count(lit(1)).as("n_ops"),
        sum(length(col("document"))).as("doc_chars"),
        min(col("version")).as("min_version"),
        max(col("version")).as("max_version"),
        max(col("ts_us")).as("max_ts_us"))
    val named =
      if (!dated) base
      else {
        // ONE dated index per flush, from the FLUSH's max cluster time —
        // the reference indexes each flush's stats as one doc into one
        // index (doIndexStats); a per-group max would let a flush
        // straddling midnight scatter its rows across two daily indices.
        // The whole-frame window runs on the already-aggregated stats
        // rows (group-count-sized), not the ops.
        import org.apache.spark.sql.expressions.Window
        base.withColumn("stats_index",
          Routing.statsIndexName(
            timestamp_micros(max(col("max_ts_us"))
              .over(Window.partitionBy())),
            statsIndexFormat))
      }
    named.drop("max_ts_us")
  }
}
