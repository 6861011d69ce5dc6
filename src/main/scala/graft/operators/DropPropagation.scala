package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Drop propagation (SURVEY §2.9 K3, `doDrop` monstache.go:3056-3075):
  * dropDatabase deletes every index under `db.*`, dropCollection deletes
  * that namespace's index; data ops that arrive after the drop re-create
  * the index. Modeled as data: for each index, find the last covering
  * drop's version and which data ops outlive it.
  *
  * Scale: the drop set is control-plane sized (broadcast); data aggregates
  * once per index key — one shuffle, no row-level state.
  */
object DropPropagation {

  /** Per-index survival report: (ix, last_drop_version, n_ops,
    * max_version, n_after_drop, survives). `droppedDatabases` /
    * `droppedCollections` are the reference's config gates (both default
    * TRUE; `doDrop` monstache.go:3056-3075 skips the index delete when
    * unset) — a disabled kind's drop events become no-ops and every
    * index survives them. */
  def indexSurvival(ops: DataFrame, droppedDatabases: Boolean = true,
                    droppedCollections: Boolean = true): DataFrame = {
    val data = ops.filter(col("operation").isin("i", "u", "d"))
      .withColumn("ix", lower(col("namespace")))
    val drops = ops.filter(col("operation").isin("drop_coll", "drop_db"))
      .filter((col("operation") === "drop_coll" && lit(droppedCollections)) ||
        (col("operation") === "drop_db" && lit(droppedDatabases)))
      .select(col("operation").as("d_op"), col("namespace").as("d_ns"),
        col("db").as("d_db"), col("version").as("d_version"))
    // both branches compare LOWERCASED names against ix (itself lowered):
    // a mixed-case dropDatabase must still cover its indexes
    val covers = (col("d_op") === "drop_coll" && lower(col("d_ns")) === col("ix")) ||
      (col("d_op") === "drop_db" &&
        col("ix").startsWith(concat(lower(col("d_db")), lit("."))))
    val lastDrop = data.select("ix").distinct()
      .join(broadcast(drops), covers, "left")
      .groupBy("ix").agg(max(col("d_version")).as("last_drop_version"))
    data.join(broadcast(lastDrop), Seq("ix"), "left")
      .groupBy("ix", "last_drop_version")
      .agg(count(lit(1)).as("n_ops"),
        max(col("version")).as("max_version"),
        sum(when(col("version") > coalesce(col("last_drop_version"), lit(-1L)), 1L)
          .otherwise(0L)).as("n_after_drop"))
      .withColumn("survives", col("n_after_drop") > 0)
  }
}
