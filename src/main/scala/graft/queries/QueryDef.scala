package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator query: the Spark plan and (when SQL-expressible)
  * the exact ANSI SQL a DuckDB oracle runs over the same parquet tables.
  * Column names and row order must match between the two — the driver
  * hash-compares values after sorting columns by name. */
case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryFamily {
  def queries: Seq[QueryDef]
}
