package graft

import org.apache.spark.sql.SparkSession

/** Canonical session settings for the engine.
  *
  * Tuned for local[N] testing but chosen to survive cluster scale:
  *   - AQE on (runtime re-plan, skew-join splitting, partition coalescing)
  *   - shuffle partitions sized to cores locally; on a real cluster this is
  *     superseded by AQE's coalescing + `spark.sql.adaptive.advisoryPartitionSizeInBytes`
  *   - UTC session timezone pinned (oracle parity; reference serializes all
  *     dates in UTC, monstachemap/encoding.go:27-36)
  *   - `nanosAsLong`: early generator revisions shipped `events.ts` as
  *     parquet TIMESTAMP(NANOS), which Spark does not read natively; as a
  *     long it is exact, and `ts div 1000` equals DuckDB's `epoch_us(ts)`.
  *     Current data ships TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ), so
  *     the config is a no-op there — [[graft.source.EventLog.tsUsOf]]
  *     adapts to whichever schema a file carries.
  */
object GraftSession {
  def configure(b: SparkSession.Builder, cores: String): SparkSession.Builder =
    b.config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // size(NULL) must be NULL, never Hive's -1: the text operators'
      // null contracts (null text → null scores → deterministic
      // fall-through language) are defined against it, and the native
      // expressions replicate exactly that
      .config("spark.sql.legacy.sizeOfNull", "false")
      .config("spark.sql.parquet.filterPushdown", "true")
      // many-small-file sources (the GridFS-analog binary corpus): the
      // 4 MB default open-cost treats every tiny file as 4 MB when
      // packing scan partitions, exploding a 5k-file read into ~150
      // tasks of ~32 files each. 256 KB still overweights real opens vs
      // bytes but packs ~500 files per task — scheduling amortized, and
      // single-file parquet scans are unaffected (nothing to pack).
      .config("spark.sql.files.openCostInBytes", (256 * 1024).toString)
      .config("spark.ui.enabled", "false")

  /** Ensure runtime confs and native functions are present even on a
    * session we did not build (the driver's Verify/Bench mains build
    * their own). Idempotent. */
  def ensure(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.sizeOfNull", "false")
    graft.functions.GraftFunctions.register(spark)
    spark
  }

  def local(cores: Int = 4): SparkSession = {
    // ensure(), not just configure(): a session built here must also
    // carry the native function registrations (graft_minhash,
    // graft_hashed_shingles, …) — without them every LSH/ANN operator
    // fails analysis with UNRESOLVED_ROUTINE.
    val s = ensure(configure(
      SparkSession.builder().master(s"local[$cores]"), cores.toString
    ).getOrCreate())
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
