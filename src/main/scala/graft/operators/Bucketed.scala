package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed (hash-clustered, per-bucket-sorted) table storage — the
  * co-located-join layout for the engine's recurring hot joins.
  *
  * The reference's relate/lookup path joins every change batch against
  * its related collections by the match key (`findId`/`find`,
  * monstache.go:1208-1341); its per-document round-trips make that a
  * latency problem, not a layout one. At 100 TB the same join is a
  * layout problem: a shuffle of both sides per batch. Storing both
  * tables `CLUSTERED BY (key) INTO n BUCKETS` makes every key-equal
  * join co-located — SortMergeJoin with ZERO Exchange on either side —
  * and any `groupBy(key)` downstream of the join inherits the bucketing
  * too (no re-shuffle for the aggregation). A filter on the bucket key
  * prunes to a single bucket's files (`SelectedBucketsCount` in the
  * scan), the lookup-side analog of the IVF index's partition pruning.
  *
  * Bucket count is fixed at write time and must match across co-joined
  * tables (Spark can coalesce mismatched counts when one divides the
  * other, at reduced parallelism); pick it for the TARGET scale —
  * buckets are split across executors, so n_buckets bounds join
  * parallelism the way shuffle partitions otherwise would.
  *
  * The input is pre-repartitioned by the bucket hash so each task holds
  * exactly one bucket's rows → ONE file per bucket. That is what lets
  * the reader trust the `SORTED BY` metadata and skip the merge-join
  * sort as well — Spark only uses per-bucket sort info when a bucket is
  * a single file AND `spark.sql.legacy.bucketedTableScan.outputOrdering`
  * is enabled (the layout stays sort-ready either way; the residual
  * per-bucket Sort under default confs is partition-local and cheap).
  */
object Bucketed {

  /** Catalog-safe table name, unique per logical table + source dir (the
    * in-memory catalog is JVM-wide and Verify/Bench/test sessions may
    * touch several scale factors). The hash suffix keeps distinct dirs
    * distinct even when sanitization collides (`sf0.1` vs `sf0_1` both
    * sanitize to `sf0_1` — without it the second caller would silently
    * read the FIRST dir's data). */
  def tableName(base: String, sfDir: String): String =
    base + "_" + sfDir.replaceAll("[^A-Za-z0-9]", "_") +
      "_" + java.lang.Integer.toHexString(sfDir.hashCode)

  /** Idempotently materialize `build` as a bucketed+sorted external
    * table; returns the catalog name to read via `spark.table(_)`.
    * (Reading the parquet path directly would silently DROP the bucket
    * metadata and bring the shuffle back — bucketing is a catalog
    * property, not a file property.) Rebuilt once per JVM: the offline
    * index-build step of the layout, never part of the per-batch
    * query. */
  def ensure(spark: SparkSession, base: String, sfDir: String, key: String,
             nBuckets: Int)(build: => DataFrame): String = synchronized {
    // synchronized: the tableExists check-then-write is not atomic, and
    // two concurrent first callers would race into overlapping
    // saveAsTable writes of the same path
    val name = tableName(base, sfDir)
    if (!spark.catalog.tableExists(name)) {
      val path = java.nio.file.Paths.get("target", "bucketed", name)
        .toAbsolutePath.toString
      build
        .repartition(nBuckets, col(key))
        .write.format("parquet")
        .bucketBy(nBuckets, key).sortBy(key)
        .option("path", path)
        .mode("overwrite")
        .saveAsTable(name)
    }
    name
  }
}
