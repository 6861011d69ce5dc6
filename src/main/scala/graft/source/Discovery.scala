package graft.source

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dynamic namespace discovery (S4) and stateful direct reads (S5).
  *
  * The reference, given `direct-read-namespaces=[""]`, enumerates every
  * db/collection in the deployment minus `local/admin/config` and
  * `system.*`, applies the include/exclude regex chain, and direct-reads
  * the survivors (`buildDynamicDirectReadNs` monstache.go:4783-4825);
  * completed namespaces are recorded so a restart skips them
  * (`filterDirectReadNamespaces`/`saveDirectReadNamespaces` 1704-1759,
  * 5162-5172). Here the "deployment" is a directory of parquet tables and
  * the completion record is a manifest directory — the same
  * skip-on-restart contract Structured Streaming checkpoints give the
  * stream side.
  */
object Discovery {

  /** Enumerate collections (parquet tables) as `<db>.<table>` namespaces,
    * sorted for determinism. */
  def listCollections(spark: SparkSession, dir: String,
                      db: String = "app"): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.endsWith(".parquet"))
      .map(n => s"$db.${n.stripSuffix(".parquet")}")
      .sorted
  }

  /** F8 + F1 driver-side: system guards then the dynamic include/exclude
    * regex pair (monstache.go:4785-4790, guards 547-557). */
  def filterNamespaces(nss: Seq[String], include: Option[String] = None,
                       exclude: Option[String] = None,
                       configDb: String = "monstache"): Seq[String] =
    nss.filterNot(ns => ns.startsWith(configDb + ".") ||
        ns.startsWith("config.") || ns.startsWith("local.") ||
        ns.startsWith("admin.") || ns.contains(".system."))
      .filter(ns => include.forall(re => ns.matches(re)))
      .filterNot(ns => exclude.exists(re => ns.matches(re)))

  /** Union of direct-read envelopes for the discovered namespaces,
    * reduced to the envelope columns shared by all tables. Each table
    * scan is bounded and parallel (Spark partitioned read = the
    * reference's DirectReadSplitMax cursors). */
  def directReadNamespaces(spark: SparkSession, dir: String,
                           nss: Seq[String]): DataFrame =
    nss.map { ns =>
      val table = ns.split("\\.", 2)(1)
      spark.read.parquet(s"$dir/$table.parquet")
        .select(lit(ns).as("namespace"), lit("i").as("operation"),
          lit(0L).as("version"), lit("direct_read").as("source"))
    }.reduce(_.unionByName(_))
}

/** S5: completion manifest for stateful direct reads. */
object DirectReadManifest {

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Namespaces recorded as completed in `manifestDir`. */
  def completed(spark: SparkSession, manifestDir: String): Set[String] = {
    val p = new Path(manifestDir)
    val f = fs(spark, manifestDir)
    if (!f.exists(p)) Set.empty
    else f.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.endsWith(".done")).map(_.stripSuffix(".done")).toSet
  }

  /** Record a namespace as completed (idempotent; called on clean finish,
    * monstache.go:5162-5172). */
  def markCompleted(spark: SparkSession, manifestDir: String, ns: String): Unit = {
    val f = fs(spark, manifestDir)
    f.mkdirs(new Path(manifestDir))
    f.create(new Path(manifestDir, s"$ns.done"), true).close()
  }

  /** The namespaces a restarted run still has to read. */
  def pending(spark: SparkSession, manifestDir: String,
              all: Seq[String]): Seq[String] =
    all.filterNot(completed(spark, manifestDir))
}
