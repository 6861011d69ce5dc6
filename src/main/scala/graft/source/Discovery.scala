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
    * regex pair (monstache.go:4785-4790, guards 547-557). Matching is
    * UNANCHORED like Go's `regexp.MatchString`: the reference accepts
    * substring patterns ("app" matches "app.users"), and fully-anchored
    * `String.matches` would silently filter everything a monstache-style
    * pattern was meant to keep. Anchored patterns (`^…$`) behave
    * identically under both. */
  def filterNamespaces(nss: Seq[String], include: Option[String] = None,
                       exclude: Option[String] = None,
                       configDb: String = "monstache"): Seq[String] = {
    def found(re: String, ns: String) = re.r.findFirstIn(ns).isDefined
    nss.filterNot(ns => ns.startsWith(configDb + ".") ||
        ns.startsWith("config.") || ns.startsWith("local.") ||
        ns.startsWith("admin.") || ns.contains(".system."))
      .filter(ns => include.forall(found(_, ns)))
      .filterNot(ns => exclude.exists(found(_, ns)))
  }

  /** Union of direct-read envelopes for the discovered namespaces,
    * reduced to the envelope columns shared by all tables. Each table
    * scan is bounded and parallel (Spark partitioned read = the
    * reference's DirectReadSplitMax cursors). */
  def directReadNamespaces(spark: SparkSession, dir: String,
                           nss: Seq[String]): DataFrame =
    // an empty namespace list (all completed in the manifest, or a regex
    // matching nothing) is a legitimate empty read, not an empty.reduce
    if (nss.isEmpty)
      emptyEnvelope(spark).select("namespace", "operation", "version", "source")
    else nss.map { ns =>
      val (_, table) = splitNamespace(ns)
      spark.read.parquet(s"$dir/$table.parquet")
        .select(lit(ns).as("namespace"), lit("i").as("operation"),
          lit(0L).as("version"), lit("direct_read").as("source"))
    }.reduce(_.unionByName(_))

  private def emptyEnvelope(spark: SparkSession): DataFrame =
    spark.emptyDataset(
      org.apache.spark.sql.Encoders.product[ChangeEvent]).toDF()

  /** A namespace must be `db.collection` with both parts non-empty — a
    * dot-less name (a forgotten db prefix, or a stray "" mixed into an
    * explicit direct-read list) is a loud config error naming the bad
    * value, never a raw MatchError. */
  private def splitNamespace(ns: String): (String, String) = {
    val i = ns.indexOf('.')
    require(i > 0 && i < ns.length - 1,
      s"namespace '$ns' is not of the form db.collection")
    (ns.substring(0, i), ns.substring(i + 1))
  }

  /** FULL-envelope direct reads: every document of each namespace as a
    * synthetic insert op in the change-event schema, so a backfill flows
    * through the SAME hot path as the stream (the reference pipes
    * direct-read docs through identical filter→map→index stages,
    * monstache.go:1704-1759). id = the table's leading column (the `_id`
    * analog of the parquet twins), document = the whole row as JSON;
    * version/ts/event_id are 0 so ANY subsequent change op wins
    * last-writer-wins against the snapshot — exactly the initial-sync
    * contract [[graft.streaming.StreamingUpsert.seedState]] wants. */
  def directReadEnvelopes(spark: SparkSession, dir: String,
                          nss: Seq[String]): DataFrame =
    if (nss.isEmpty) emptyEnvelope(spark)
    else nss.map { ns =>
      val (db, table) = splitNamespace(ns)
      val df = spark.read.parquet(s"$dir/$table.parquet")
      df.select(
        lit(0L).as("event_id"),
        col(df.columns.head).cast("string").as("id"),
        lit(db).as("db"),
        lit(table).as("coll"),
        lit(ns).as("namespace"),
        lit("i").as("operation"),
        lit(0L).as("ts_us"),
        lit(0L).as("version"),
        to_json(struct(df.columns.map(col): _*)).as("document"),
        lit(0.0d).as("value"),
        lit("direct_read").as("source"))
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
