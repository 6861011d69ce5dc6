package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table profiling and key-skew diagnostics — the data-quality reports a
  * team runs BEFORE pointing a 100 TB pipeline at a table: what is in
  * each column, and which join keys will melt a reducer. All outputs are
  * exact integers (exact distinct counts, not sketches: a profile that
  * can be wrong by 2% cannot gate a pipeline). */
object Profile {

  /** Per-column profile: (column, dtype, n_rows, n_nulls, n_distinct,
    * n_blank — empty-or-whitespace strings, NULL for non-strings). One
    * row per profiled column.
    *
    * Scale shape: ONE pass — all columns' aggregates ride a single
    * aggregation (Spark plans multi-count-DISTINCT via one Expand: the
    * scan happens once, expanded rows shuffle once per distinct-column
    * group), then the single agg row unpivots to per-column rows via a
    * literal-sized explode. Per-column queries would rescan the table
    * |columns| times — at 100 TB the Expand is the right trade, and
    * callers profile a COLUMN SUBSET when the table is very wide. */
  def tableProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "tableProfile: no columns to profile")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"tableProfile: columns not in the frame: ${missing.mkString(", ")}")
    val isStr = cols.map(c =>
      c -> df.schema(c).dataType.isInstanceOf[org.apache.spark.sql.types.StringType]).toMap
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c")) ++
        (if (isStr(c))
           Seq(sum(when(trim(col(c)) === "", 1L).otherwise(0L))
             .as(s"__nb_$c"))
         else Nil)
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("column"),
        lit(df.schema(c).dataType.simpleString).as("dtype"),
        col("__n").as("n_rows"),
        col(s"__nn_$c").as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        (if (isStr(c)) col(s"__nb_$c") else lit(null).cast("long"))
          .as("n_blank"))
    }
    one.select(explode(array(rows: _*)).as("p")).select("p.*")
  }

  /** Top-k heaviest values of a prospective join/grouping key, with
    * their corpus share — the salting decision's input: a key holding
    * 30% of the rows makes the plain shuffle a one-reducer job.
    * Returns (rank, key — as string, NULL rows under the NULL key —,
    * n, share_micro), rank by (count DESC, key ASC).
    *
    * Scale shape: one map-side-combined count per key, then a bounded
    * TakeOrdered for the top slice (k is report-sized) — never a full
    * sort of the key census. */
  def keySkew(df: DataFrame, keyCol: String, k: Int = 20): DataFrame = {
    require(k >= 1, s"keySkew: k=$k")
    import org.apache.spark.sql.functions.broadcast
    val counts = df.groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("n"))
    val total = df.agg(count(lit(1)).as("__t"))
    counts.orderBy(col("n").desc, col("key").asc_nulls_first).limit(k)
      .crossJoin(broadcast(total))
      .withColumn("share_micro", expr("n * 1000000L DIV greatest(__t, 1L)"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("n").desc, col("key").asc_nulls_first)))
      .select(col("rank").cast("long"), col("key"), col("n"),
        col("share_micro"))
  }
}
