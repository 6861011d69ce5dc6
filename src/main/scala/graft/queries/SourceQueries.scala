package graft.queries

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.operators.{FileContent, Lookups, PipelineRegistry}
import graft.source.{ChangeEvent, Discovery, DirectReadManifest, EventLog, Shards}
import graft.streaming.{RetryingSink, StreamingUpsert}

/** Source/lookup queries: dynamic namespace discovery (S4), sharded
  * fan-in + per-stream resume tokens (S6/T2), pipeline pushdown (A1),
  * GridFS-analog file content (S7), the findId/findOne script builtins
  * (J4), and the multimodal asset schema. */
object SourceQueries extends QueryFamily {

  val queries: Seq[QueryDef] = Seq(

    // ── S6/T2: sharded fan-in. Three "shards" tail disjoint slices of
    //    the oplog; a fourth (a direct-read) is hot-added to the union.
    //    Resume tokens = furthest version per stream id, what saveTokens
    //    persists each checkpoint tick (monstache.go:1658-1687). ─────────
    QueryDef.sorted(
      "q47_shard_fanin",
      (s, dir) => {
        val env = EventLog.envelope(s, dir)
        val shards = (0 until 3).map(i =>
          s"shard-$i" -> env.filter(col("event_id") % 3 === i))
        val hotAdded = "shard-orders" ->
          EventLog.directRead(s, dir, "orders", "o_orderkey", "app.orders")
        Shards.resumeTokens(Shards.fanIn(shards :+ hotAdded))
      },
      _.orderBy("stream_id"),
      Some(
        s"""WITH ${EventLog.oracleCte},
           |tagged AS (
           |  SELECT 'shard-' || CAST(event_id % 3 AS VARCHAR) AS stream_id, version
           |  FROM envelope
           |  UNION ALL
           |  SELECT 'shard-orders', 0 FROM orders)
           |SELECT stream_id, max(version) AS resume_token, count(*) AS n_ops
           |FROM tagged GROUP BY stream_id ORDER BY stream_id""".stripMargin)),

    // ── A1: per-namespace pipeline pushdown. The registry's stages are
    //    applied at the source, so the $match lands in PushedFilters and
    //    the $project prunes the read schema (PlanAuditSpec pins this);
    //    change-stream and direct-read paths get different stages via the
    //    changeEvent flag (monstache.go:4357-4377). ──────────────────────
    QueryDef.sorted(
      "q48_pipeline_pushdown",
      (s, dir) => {
        val reg = PipelineRegistry(Map(
          "" -> ((_, ce) =>
            if (ce) Seq(df => df.filter(col("value").isNotNull)) else Seq.empty),
          "app.events" -> ((_, ce) =>
            if (ce) Seq(
              df => df.filter(col("value") > 50),
              df => df.select("event_id", "user_id", "value"))
            else Seq.empty),
          "app.orders" -> ((_, ce) =>
            if (!ce) Seq(df => df.filter(col("o_orderkey") % 100 === 0))
            else Seq.empty)))
        val stream = reg(s.read.parquet(s"$dir/events.parquet"),
            "app.events", changeEvent = true)
          .select(lit("stream").as("path"), col("value"))
        val direct = reg(s.read.parquet(s"$dir/orders.parquet"),
            "app.orders", changeEvent = false)
          .select(lit("direct").as("path"),
            col("o_totalprice").cast("double").as("value"))
        stream.unionByName(direct)
          .groupBy("path")
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_v"))
      },
      _.orderBy("path"),
      Some(
        """WITH u AS (
          |  SELECT 'stream' AS path, value FROM events
          |  WHERE value IS NOT NULL AND value > 50
          |  UNION ALL
          |  SELECT 'direct', CAST(o_totalprice AS DOUBLE) FROM orders
          |  WHERE o_orderkey % 100 = 0)
          |SELECT path, count(*) AS n,
          |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
          |FROM u GROUP BY path ORDER BY path""".stripMargin)),

    // ── Multimodal asset plumbing: opaque binary + typed metadata. The
    //    decode stays a stubbed Scala step (no codecs in this container,
    //    unit-tested); the schema/metadata derivation is oracle-checked.
    QueryDef.sorted(
      "q44_multimodal_meta",
      (s, dir) => Multimodal.assetsFromDocuments(
          s.read.parquet(s"$dir/documents.parquet").select("doc_id", "text"))
        .select(col("asset_id"), col("kind"),
          octet_length(col("content")).cast("long").as("n_bytes"),
          col("meta.width"), col("meta.height"), col("meta.sample_rate"),
          col("meta.duration_ms"), col("meta.format")),
      _.orderBy("asset_id"),
      Some(
        """WITH a AS (
          |  SELECT CAST(doc_id AS BIGINT) AS asset_id,
          |         CASE WHEN doc_id % 3 = 0 THEN 'image'
          |              WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
          |         octet_length(encode(text)) AS n FROM documents)
          |SELECT asset_id, kind, CAST(n AS BIGINT) AS n_bytes,
          |       CAST(CASE WHEN kind = 'image' THEN n % 640 ELSE 0 END AS INTEGER) AS width,
          |       CAST(CASE WHEN kind = 'image' THEN n % 480 ELSE 0 END AS INTEGER) AS height,
          |       CAST(CASE WHEN kind = 'audio' THEN 16000 ELSE 0 END AS INTEGER) AS sample_rate,
          |       CAST(CASE WHEN kind <> 'image' THEN n * 40 ELSE 0 END AS BIGINT) AS duration_ms,
          |       CASE WHEN kind = 'image' THEN 'png' WHEN kind = 'audio' THEN 'wav' ELSE 'mkv' END AS format
          |FROM a ORDER BY asset_id""".stripMargin)),

    // ── J4 findId: broadcast point lookup with projection ────────────────
    QueryDef.sorted(
      "q40_find_id",
      (s, dir) => {
        val keys = s.read.parquet(s"$dir/orders.parquet")
          .filter(col("o_orderkey") % 500 === 0)
          .select(col("o_custkey").as("c_custkey")).distinct()
        val customer = s.read.parquet(s"$dir/customer.parquet")
        Lookups.findId(keys, customer, "c_custkey",
            Seq("c_name", "c_mktsegment", "c_acctbal"))
      },
      _.orderBy("c_custkey"),
      Some(
        """SELECT c_custkey, c_name, c_mktsegment, c_acctbal
          |FROM customer
          |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderkey % 500 = 0)
          |ORDER BY c_custkey""".stripMargin)),

    // ── J4 findOne: first match per group under a deterministic sort,
    //    via min_by (partial agg — no window sort at scale) ───────────────
    QueryDef.sorted(
      "q43_find_one",
      (s, dir) => Lookups.findOne(
          s.read.parquet(s"$dir/customer.parquet"),
          groupCol = "c_mktsegment", sortCol = "c_custkey",
          select = Seq("c_custkey", "c_name")),
      _.orderBy("c_mktsegment"),
      Some(
        """SELECT c_mktsegment, min(c_custkey) AS c_custkey,
          |       min_by(c_name, c_custkey) AS c_name
          |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // ── S7: file-content attach with the max-file-size cap ───────────────
    QueryDef.sorted(
      "q41_file_content",
      (s, dir) => FileContent.attach(
          s.read.parquet(s"$dir/documents.parquet").select("doc_id", "text"),
          "text", maxBytes = 300)
        .select(col("doc_id").cast("long"),
          octet_length(col("text")).cast("long").as("n_bytes"), col("file")),
      _.orderBy("doc_id"),
      Some(
        """SELECT CAST(doc_id AS BIGINT) AS doc_id,
          |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
          |       CASE WHEN octet_length(encode(text)) <= 300
          |            THEN to_base64(encode(text)) END AS file
          |FROM documents ORDER BY doc_id""".stripMargin)),

    // ── S7 over REAL binary files: generated non-UTF-8 fixtures read
    //    through the binaryFile source, then the same cap/base64 path as
    //    q41. The oracle rebuilds the identical bytes from the documents
    //    table (unhex(repeat(md5(text), r))) — no filesystem needed. The
    //    40-byte cap bites the r ≥ 3 files, exercising the "too big →
    //    doc indexes without content" branch on real lengths. ────────────
    QueryDef.sorted(
      "q58_binary_files",
      (s, dir) => {
        val fixDir = graft.source.BinaryFixtures.ensure(s, dir)
        FileContent.attach(
            s.read.format("binaryFile").load(s"$fixDir/*.bin"),
            "content", maxBytes = 40)
          .select(
            regexp_extract(col("path"), "doc_(\\d+)\\.bin$", 1)
              .cast("long").as("doc_id"),
            col("length").cast("long").as("n_bytes"),
            col("file"),
            substring(hex(col("content")), 1, 16).as("hex_prefix"))
      },
      _.orderBy("doc_id"),
      Some(
        """SELECT CAST(doc_id AS BIGINT) AS doc_id,
          |       CAST(16 * ((doc_id // 10) % 4 + 1) AS BIGINT) AS n_bytes,
          |       CASE WHEN 16 * ((doc_id // 10) % 4 + 1) <= 40
          |            THEN to_base64(unhex(repeat(md5(text), CAST((doc_id // 10) % 4 + 1 AS INT)))) END AS file,
          |       upper(substr(md5(text), 1, 16)) AS hex_prefix
          |FROM documents WHERE doc_id % 10 = 0 ORDER BY doc_id""".stripMargin)),

    // ── S4: dynamic namespace discovery → direct-read union ──────────────
    QueryDef.sorted(
      "q42_dynamic_direct_read",
      (s, dir) => {
        val nss = Discovery.filterNamespaces(
          Discovery.listCollections(s, dir),
          include = Some("^app\\.(region|nation|supplier|customer)$"),
          exclude = Some("^app\\.nation$"))
        Discovery.directReadNamespaces(s, dir, nss)
          .groupBy("namespace", "source")
          .agg(count(lit(1)).as("n"))
      },
      _.orderBy("namespace"),
      Some(
        """SELECT * FROM (
          |  SELECT 'app.customer' AS namespace, 'direct_read' AS source, count(*) AS n FROM customer
          |  UNION ALL SELECT 'app.region', 'direct_read', count(*) FROM region
          |  UNION ALL SELECT 'app.supplier', 'direct_read', count(*) FROM supplier)
          |ORDER BY namespace""".stripMargin)),

    // ── S5: stateful direct reads. Run 1 reads two of three namespaces
    //    and records them in the completion manifest ("crash" before the
    //    third); the restarted run 2 reads ONLY the pending namespace;
    //    run 3 finds nothing pending and reads nothing — the reference's
    //    filterDirectReadNamespaces / saveDirectReadNamespaces contract
    //    (monstache.go:1704-1759, 5162-5172) as data. ─────────────────────
    QueryDef.sorted(
      "q86_direct_read_manifest",
      (s, dir) => {
        // All manifest traffic (pending → markCompleted per simulated
        // restart) runs in this straight-line prelude against a fresh
        // temp manifest, so the three runs' namespace lists are fully
        // determined before any DataFrame exists; the frame construction
        // below is pure over the captured lists and the whole query body
        // is re-invocable within a session.
        val runLists: Seq[(Int, Seq[String])] = {
          val manifestDir = java.nio.file.Files
            .createTempDirectory("graft-drm").toString
          val all = Discovery.filterNamespaces(
            Discovery.listCollections(s, dir),
            include = Some("^app\\.(region|nation|supplier)$"))
          (1 to 3).map { run =>
            val pending = DirectReadManifest.pending(s, manifestDir, all)
            // run 1 "crashes" after two of three namespaces
            val nss = if (run == 1) pending.take(2) else pending
            nss.foreach(DirectReadManifest.markCompleted(s, manifestDir, _))
            run -> nss
          }
        }
        runLists.map { case (run, nss) =>
          Discovery.directReadNamespaces(s, dir, nss)
            .groupBy("namespace")
            .agg(count(lit(1)).as("n"))
            .select(lit(run.toLong).as("run"), col("namespace"), col("n"))
        }.reduce(_ unionByName _)
      },
      _.orderBy("run", "namespace"),
      Some(
        """SELECT * FROM (
          |  SELECT CAST(1 AS BIGINT) AS run, 'app.nation' AS namespace, count(*) AS n FROM nation
          |  UNION ALL SELECT 1, 'app.region', count(*) FROM region
          |  UNION ALL SELECT 2, 'app.supplier', count(*) FROM supplier)
          |ORDER BY run, namespace""".stripMargin)),

    // ── T7: retry/backoff sink. The bulk write fails twice with injected
    //    transient errors; withRetry backs off 7 ms then 14 ms (the
    //    reference's 1 min → 1 h doubling, monstache.go:559-632 scaled
    //    down) and the third attempt delivers. The query certifies the
    //    DELIVERED bytes (read back from the sink) plus the attempt count
    //    and the exact backoff schedule — all cross-engine checkable. ─────
    QueryDef.sorted(
      "q87_retry_sink",
      (s, dir) => {
        val out = java.nio.file.Files
          .createTempDirectory("graft-retry").toString
        val attempts = new java.util.concurrent.atomic.AtomicInteger()
        val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
        RetryingSink.withRetry(maxRetries = 5, baseMs = 7, capMs = 3600000L,
            sleep = sleeps += _) {
          if (attempts.getAndIncrement() < 2)
            throw new RuntimeException("injected transient sink failure")
          EventLog.envelope(s, dir).write.mode("overwrite").parquet(out)
        }
        s.read.parquet(out)
          .groupBy("operation")
          .agg(count(lit(1)).as("n_ops"), max(col("version")).as("max_version"))
          .withColumn("attempts", lit(attempts.get().toLong))
          .withColumn("backoff_ms", lit(sleeps.mkString(",")))
      },
      _.orderBy("operation"),
      Some(
        s"""WITH ${EventLog.oracleCte}
           |SELECT operation, count(*) AS n_ops, max(version) AS max_version,
           |       CAST(3 AS BIGINT) AS attempts, '7,14' AS backoff_ms
           |FROM envelope GROUP BY operation ORDER BY operation""".stripMargin)),

    // ── K6: post-process plugin hook. The hook (the reference's Process
    //    plugin, monstachemap/plugin.go:46-52, pool monstache.go:4486-4498)
    //    runs per micro-batch after the state merge; the query feeds the
    //    envelope through the streaming pipeline and certifies that the
    //    hook saw EVERY op exactly once (at-least-once + committed batches
    //    = exactly-once accounting under AvailableNow). Sums are
    //    batch-count-independent, so micro-batch boundaries don't matter. ──
    QueryDef.sorted(
      "q88_post_process_hook",
      (s, dir) => {
        implicit val sqlCtx = s.sqlContext
        import s.implicits._
        val stateDir = java.nio.file.Files
          .createTempDirectory("graft-pp-state").toString
        val ckpt = java.nio.file.Files
          .createTempDirectory("graft-pp-ckpt").toString
        val stream = org.apache.spark.sql.execution.streaming.runtime
          .MemoryStream[ChangeEvent]
        stream.addData(EventLog.envelope(s, dir).as[ChangeEvent].collect().toSeq)
        val audit = new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()
        StreamingUpsert.start(stream.toDF(), stateDir, ckpt,
          postProcess = (batch, _) =>
            batch.groupBy("operation")
              .agg(count(lit(1)).as("n"), max(col("version")).as("mv"))
              .collect().foreach { r =>
                audit.merge(r.getString(0), (r.getLong(1), r.getLong(2)),
                  (a, b) => (a._1 + b._1, math.max(a._2, b._2)))
              }).awaitTermination()
        audit.entrySet().iterator().asScala.toSeq
          .map(e => (e.getKey, e.getValue._1, e.getValue._2))
          .toDF("operation", "n_ops", "max_version")
      },
      _.orderBy("operation"),
      Some(
        s"""WITH ${EventLog.oracleCte}
           |SELECT operation, count(*) AS n_ops, max(version) AS max_version
           |FROM envelope GROUP BY operation ORDER BY operation""".stripMargin))
  )
}
