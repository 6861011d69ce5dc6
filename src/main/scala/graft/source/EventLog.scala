package graft.source

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession

/** The change-event envelope (SURVEY.md §1.3) derived deterministically from
  * the driver's `events` table, which stands in for a MongoDB change stream
  * (gtm.Op, monstache.go:815-840): every event becomes an insert / update /
  * delete op on a per-user document living in one of four collections.
  *
  * The derivation is defined twice — once as Spark column algebra here, once
  * as the ANSI SQL fragment [[EventLog.oracleCte]] — and the two MUST stay
  * in lockstep: the driver hash-compares results of both.
  *
  * Versioning follows the reference's external-version scheme
  * (monstache.go:4053-4063): monotonic in cluster time, with insert/update/
  * delete offset 0/1/2 so a delete beats a same-timestamp update. Here the
  * cluster time is the event's epoch-microsecond instant: version =
  * ts_us * 4 + offset.
  *
  * Scale note: this is a pure narrow projection over the parquet scan — no
  * shuffle, fully codegen'd, and column pruning reaches the reader.
  */
object EventLog {

  /** Epoch-microsecond instant of the raw events `ts` column, adaptive to
    * the two schemas the driver's generator has shipped: parquet
    * TIMESTAMP(NANOS) (surfaced as BIGINT nanos under the session's
    * `nanosAsLong` — divide to micros) and TIMESTAMP(MICROS) (surfaced
    * as TIMESTAMP_NTZ — the wall clock IS the UTC instant; the
    * NTZ-to-NTZ `timestampdiff` keeps the conversion
    * session-timezone-INDEPENDENT, where a cast through TIMESTAMP would
    * silently shift the instant on a non-UTC session). Every branch
    * equals DuckDB's `epoch_us(ts)` over the same file, which is what
    * the oracle CTEs compute. */
  def tsUsOf(ev: DataFrame): org.apache.spark.sql.Column =
    ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000")
      case org.apache.spark.sql.types.TimestampNTZType =>
        expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
      case org.apache.spark.sql.types.TimestampType => unix_micros(col("ts"))
      case dt => throw new IllegalArgumentException(
        s"events.ts: expected nanos BIGINT or a timestamp type, got $dt")
    }

  /** Envelope columns: event_id, id, db, coll, namespace, operation,
    * ts_us, version, document (JSON, null for deletes), value, source. */
  def envelope(spark: SparkSession, dir: String): DataFrame = {
    GraftSession.ensure(spark)
    envelopeFrom(spark.read.parquet(s"$dir/events.parquet"))
  }

  /** The same derivation over any events frame — including a streaming
    * one (`readStream.schema(...).parquet(dir)`), so the change-stream
    * path (S1) uses the identical decode as the batch stand-in. */
  def envelopeFrom(ev: DataFrame): DataFrame = {
    val op = when(col("event_type") === "signup", "i")
      .when(col("event_type") === "error", "d")
      .otherwise("u")
    val offset = when(col("event_type") === "signup", 0L)
      .when(col("event_type") === "error", 2L)
      .otherwise(1L)
    val tsUs = tsUsOf(ev)
    val shard = (col("user_id") % 4).cast("string")
    ev.select(
      col("event_id"),
      col("user_id").cast("string").as("id"),
      lit("app").as("db"),
      concat(lit("t"), shard).as("coll"),
      concat(lit("app.t"), shard).as("namespace"),
      op.as("operation"),
      tsUs.as("ts_us"),
      (tsUs * 4 + offset).as("version"),
      when(col("event_type") === "error", lit(null).cast("string"))
        .otherwise(col("props")).as("document"),
      col("value"),
      lit("oplog").as("source")
    )
  }

  /** DuckDB CTE computing exactly [[envelope]] from the raw `events` table.
    * Prepend as `WITH envelope AS (...)` in oracle SQL. */
  val oracleCte: String =
    """envelope AS (
      |  SELECT event_id,
      |         CAST(user_id AS VARCHAR) AS id,
      |         'app' AS db,
      |         't' || CAST(user_id % 4 AS VARCHAR) AS coll,
      |         'app.t' || CAST(user_id % 4 AS VARCHAR) AS namespace,
      |         CASE event_type WHEN 'signup' THEN 'i' WHEN 'error' THEN 'd' ELSE 'u' END AS operation,
      |         epoch_us(ts) AS ts_us,
      |         epoch_us(ts) * 4 + (CASE event_type WHEN 'signup' THEN 0 WHEN 'error' THEN 2 ELSE 1 END) AS version,
      |         CASE WHEN event_type = 'error' THEN NULL ELSE props END AS document,
      |         value,
      |         'oplog' AS source
      |  FROM events
      |)""".stripMargin

  /** Envelope plus deterministic drop ops (F4/K3): every 500th event also
    * emits a dropCollection on its shard's namespace, every 1750th a
    * dropDatabase on `app`, every 3333rd a dropCollection on
    * `legacy.users` (exists to be excluded by drop-regex configs). Drop
    * ops carry no id/document and version offset 0, the reference's
    * fall-through (monstache.go:4053-4063); drops are detected via
    * IsDropDatabase/IsDropCollection at monstache.go:3057/3065. */
  def envelopeWithDrops(spark: SparkSession, dir: String): DataFrame = {
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val tsUs = tsUsOf(ev)
    def dropOps(pred: org.apache.spark.sql.Column, db: String,
                coll: org.apache.spark.sql.Column, ns: org.apache.spark.sql.Column,
                op: String) =
      ev.filter(pred).select(
        col("event_id"),
        lit(null).cast("string").as("id"),
        lit(db).as("db"),
        coll.cast("string").as("coll"),
        ns.cast("string").as("namespace"),
        lit(op).as("operation"),
        tsUs.as("ts_us"),
        (tsUs * 4).as("version"),
        lit(null).cast("string").as("document"),
        lit(null).cast("double").as("value"),
        lit("oplog").as("source"))
    val shard = concat(lit("t"), col("user_id") % 4)
    envelope(spark, dir)
      .unionByName(dropOps(col("event_id") % 500 === 0, "app", shard,
        concat(lit("app."), shard), "drop_coll"))
      .unionByName(dropOps(col("event_id") % 1750 === 0, "app",
        lit(null), lit("app"), "drop_db"))
      .unionByName(dropOps(col("event_id") % 3333 === 0, "legacy",
        lit("users"), lit("legacy.users"), "drop_coll"))
  }

  /** DuckDB CTE computing exactly [[envelopeWithDrops]]. */
  val oracleCteWithDrops: String =
    """envd AS (
      |  SELECT event_id,
      |         CAST(user_id AS VARCHAR) AS id,
      |         'app' AS db,
      |         't' || CAST(user_id % 4 AS VARCHAR) AS coll,
      |         'app.t' || CAST(user_id % 4 AS VARCHAR) AS namespace,
      |         CASE event_type WHEN 'signup' THEN 'i' WHEN 'error' THEN 'd' ELSE 'u' END AS operation,
      |         epoch_us(ts) AS ts_us,
      |         epoch_us(ts) * 4 + (CASE event_type WHEN 'signup' THEN 0 WHEN 'error' THEN 2 ELSE 1 END) AS version,
      |         CASE WHEN event_type = 'error' THEN NULL ELSE props END AS document,
      |         value, 'oplog' AS source
      |  FROM events
      |  UNION ALL
      |  SELECT event_id, NULL, 'app', 't' || CAST(user_id % 4 AS VARCHAR),
      |         'app.t' || CAST(user_id % 4 AS VARCHAR), 'drop_coll',
      |         epoch_us(ts), epoch_us(ts) * 4, NULL, NULL, 'oplog'
      |  FROM events WHERE event_id % 500 = 0
      |  UNION ALL
      |  SELECT event_id, NULL, 'app', NULL, 'app', 'drop_db',
      |         epoch_us(ts), epoch_us(ts) * 4, NULL, NULL, 'oplog'
      |  FROM events WHERE event_id % 1750 = 0
      |  UNION ALL
      |  SELECT event_id, NULL, 'legacy', 'users', 'legacy.users', 'drop_coll',
      |         epoch_us(ts), epoch_us(ts) * 4, NULL, NULL, 'oplog'
      |  FROM events WHERE event_id % 3333 = 0
      |)""".stripMargin

  /** Batch "direct read" stand-in (SURVEY §2.1 S3): a full collection scan
    * where every row is an insert op at version 0, exactly how the reference
    * replays a collection through the same pipeline (monstache.go:3088). */
  def directRead(spark: SparkSession, dir: String, table: String,
                 idCol: String, namespace: String): DataFrame = {
    GraftSession.ensure(spark)
    spark.read.parquet(s"$dir/$table.parquet")
      .withColumn("id", col(idCol).cast("string"))
      .withColumn("namespace", lit(namespace))
      .withColumn("operation", lit("i"))
      .withColumn("version", lit(0L))
      .withColumn("source", lit("direct_read"))
  }
}
