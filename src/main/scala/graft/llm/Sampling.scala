package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic splitting and sampling for training-data pipelines.
  * Everything keys off a salted content hash of the document id — never an
  * RNG — so assignment is a pure function of the row: replayable across
  * runs, engines, and cluster sizes, stable under repartitioning, and
  * incremental (new documents join a split without reshuffling old ones).
  * `sample()`/`rand()` have none of these properties (seed × partitioning
  * dependent), which is why a curation pipeline cannot use them: the
  * train/val/test membership of 100 TB must not change because the input
  * was re-bucketed.
  *
  * All narrow per-row column algebra (one md5 per row); the only shuffles
  * in this file are the summary groupBys the queries add on top. Distinct
  * salts keep the split and sample hashes independent — reusing one hash
  * would correlate membership (every sampled doc would land in the same
  * split band).
  */
object Sampling {

  val SplitSalt = "graft-split|"
  val SampleSalt = "graft-sample|"

  /** Percent bucket 0-99 from the salted id hash. */
  def splitBucket(id: Column, salt: String = SplitSalt): Column =
    TextHash.h32p(concat(lit(salt), id.cast("string"))) % 100

  /** Train/val/test assignment: `trainPct`% train, `valPct`% val, rest
    * test — deterministic per id. */
  def withSplit(docs: DataFrame, idCol: String = "doc_id",
                trainPct: Int = 90, valPct: Int = 5): DataFrame =
    docs.withColumn("split_bucket", splitBucket(col(idCol)))
      .withColumn("split",
        when(col("split_bucket") < trainPct, "train")
          .when(col("split_bucket") < trainPct + valPct, "val")
          .otherwise("test"))

  /** Per-stratum downsampling at exact per-mille rates: a row survives
    * when its salted hash lands under its stratum's rate. Rates are
    * config-sized (a when-chain, broadcast like any literal); strata
    * absent from `rates` keep `defaultPermille`. The standard corpus
    * rebalancing move (cap the over-represented language/source strata)
    * with exact replayability. */
  def stratifiedSample(docs: DataFrame, strataCol: String,
                       rates: Seq[(String, Int)],
                       defaultPermille: Int = 1000,
                       idCol: String = "doc_id"): DataFrame = {
    val rate = rates.foldRight(lit(defaultPermille): Column) {
      case ((stratum, permille), els) =>
        when(col(strataCol) === stratum, permille).otherwise(els)
    }
    docs.filter(
      TextHash.h32p(concat(lit(SampleSalt), col(idCol).cast("string"))) % 1000
        < rate)
  }

  // ── DuckDB twins (same salt, same md5-prefix hash) ────────────────────
  /** SQL: the percent bucket over an id expression. */
  def sqlSplitBucket(id: String, salt: String = SplitSalt): String =
    s"(${TextHash.sqlH32p(s"concat('$salt', CAST($id AS VARCHAR))")} % 100)"

  /** SQL: the split label (same bucket thresholds). */
  def sqlSplit(id: String, trainPct: Int = 90, valPct: Int = 5): String =
    s"""CASE WHEN ${sqlSplitBucket(id)} < $trainPct THEN 'train'
       | WHEN ${sqlSplitBucket(id)} < ${trainPct + valPct} THEN 'val'
       | ELSE 'test' END""".stripMargin.replaceAll("\n", "")

  /** SQL: the stratified-sample keep predicate. */
  def sqlSampleKeep(id: String, strataCol: String, rates: Seq[(String, Int)],
                    defaultPermille: Int = 1000): String = {
    val cases = rates.map { case (s, p) => s"WHEN $strataCol = '$s' THEN $p" }
      .mkString(" ")
    s"(${TextHash.sqlH32p(s"concat('$SampleSalt', CAST($id AS VARCHAR))")} % 1000)" +
      s" < (CASE $cases ELSE $defaultPermille END)"
  }
}
