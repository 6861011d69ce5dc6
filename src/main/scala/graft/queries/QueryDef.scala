package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator query: the Spark plan and (when SQL-expressible)
  * the exact ANSI SQL a DuckDB oracle runs over the same parquet tables.
  * Column names and row order must match between the two — the driver
  * hash-compares values after sorting columns by name.
  *
  * `fn` is the verification plan (deterministically ordered, row-for-row
  * comparable). `benchFn`, when present, is the operator plan alone — the
  * same computation without the outermost presentation sort, which exists
  * only so the oracle compare is row-stable. The reference imposes no
  * output order anywhere (SURVEY §2.6: sort/limit exist only inside script
  * lookups), so a global sort is verification scaffolding, not semantics,
  * and Bench must not measure it. Semantic orderings (top-k windows,
  * orderBy+limit) stay inside the operator plan in both variants.
  */
case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    benchFn: Option[(SparkSession, String) => DataFrame] = None) {
  def bench: (SparkSession, String) => DataFrame = benchFn.getOrElse(fn)
}

object QueryDef {
  /** The common shape: `core` is the operator; verify wraps it in a total
    * order for the row-wise oracle compare, bench measures `core` alone. */
  def sorted(name: String,
             core: (SparkSession, String) => DataFrame,
             order: DataFrame => DataFrame,
             oracle: Option[String]): QueryDef =
    QueryDef(name, (s, d) => order(core(s, d)), oracle, Some(core))
}

trait QueryFamily {
  def queries: Seq[QueryDef]
}
