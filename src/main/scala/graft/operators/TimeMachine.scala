package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-machine history sink (SURVEY §2.9 K4, monstache.go:3253-3291).
  *
  * For namespaces opted in, every version of every doc is appended to a
  * dated history index `log.<index>.<yyyy-MM-dd>` with `_source_id` = the
  * doc id and routing by doc id; entries are append-only (no id → no
  * overwrite).
  *
  * Spark shape: a projection adding the history index name as a column; a
  * real writer would `partitionBy(history_date)` so history lands in
  * day-partitioned append-only storage — the idiomatic equivalent of dated
  * indices, and partition-prunable at read time.
  */
object TimeMachine {

  /** The reference's name rule (monstache.go:3256-3260):
    * `lower(prefix.index.<date>)` where the configurable SUFFIX is itself
    * a Go date layout applied to the clock (`t.Format(suf)`, defaults
    * prefix "log", suffix "2006-01-02" → daily indices). Here the date
    * comes from the op's own cluster time, not the wall clock —
    * deterministic and replayable; the layout is translated via
    * [[graft.codec.Codecs.goLayoutToJvm]]. */
  def history(df: DataFrame, namespaces: Seq[String],
              prefix: String = "log",
              suffixGoLayout: String = "2006-01-02"): DataFrame = {
    val day = date_format(timestamp_micros(col("ts_us")),
      graft.codec.Codecs.goLayoutToJvm(suffixGoLayout))
    df.filter(col("namespace").isin(namespaces: _*))
      .filter(col("operation").isin("i", "u", "d"))
      .withColumn("history_date", day)
      .withColumn("history_index",
        lower(concat_ws(".", lit(prefix), col("namespace"), day)))
      .withColumn("source_id", col("id"))
      .withColumn("history_routing", col("id"))
  }

  /** The history sink itself: append-only, day-partitioned storage — the
    * idiomatic equivalent of the reference's dated indices (one index per
    * day ↔ one partition directory per day; both prune reads by date and
    * let retention drop whole days). Append mode mirrors the no-id bulk
    * requests (every version is a new row, never an overwrite). */
  def writeHistory(historyDf: DataFrame, dir: String): Unit =
    historyDf.write.mode("append").partitionBy("history_date").parquet(dir)
}
