package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.codec.Codecs
import graft.llm.QuantileSketch
import graft.operators._
import graft.source.EventLog

/** Core monstache-semantics queries (SURVEY §2.1-2.3, §2.8-2.9) over the
  * driver tables. Every query is ordered by a unique key so Spark and the
  * DuckDB oracle agree row-for-row. */
object CoreQueries extends QueryFamily {

  private def withEnvelope(sql: String): String =
    s"WITH ${EventLog.oracleCte}\n$sql"

  val queries: Seq[QueryDef] = Seq(

    // ── S1/S3: the envelope itself (change-stream decode, §1.3) ──────────
    QueryDef.sorted(
      "q01_envelope",
      (s, dir) => EventLog.envelope(s, dir)
        .select("event_id", "id", "namespace", "operation", "ts_us",
          "version", "source", "document"),
      _.orderBy("event_id"),
      Some(withEnvelope(
        """SELECT event_id, id, namespace, operation, ts_us, version, source, document
          |FROM envelope ORDER BY event_id""".stripMargin))),

    // ── F1-F3: namespace include/exclude regex chain ─────────────────────
    QueryDef.sorted(
      "q02_ns_filter",
      (s, dir) => {
        val cfg = NamespaceFilterConfig(
          include = Some("^app\\.t[0-2]$"), exclude = Some("^app\\.t2$"))
        NamespaceFilter(EventLog.envelope(s, dir), cfg)
          .groupBy("namespace", "operation")
          .agg(count(lit(1)).as("n"))
      },
      _.orderBy("namespace", "operation"),
      Some(withEnvelope(
        """SELECT namespace, operation, count(*) AS n
          |FROM envelope
          |WHERE regexp_matches(namespace, '^app\.t[0-2]$')
          |  AND NOT regexp_matches(namespace, '^app\.t2$')
          |GROUP BY namespace, operation
          |ORDER BY namespace, operation""".stripMargin))),

    // ── P1: mapper projection (computed columns over lineitem) ───────────
    QueryDef.sorted(
      "q03_mapper_project",
      (s, dir) => s.read.parquet(s"$dir/lineitem.parquet")
        .select(
          col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          (col("l_extendedprice") * (lit(1) - col("l_discount")) *
            (lit(1) + col("l_tax"))).as("charge"),
          concat(col("l_returnflag"), lit("/"), col("l_linestatus")).as("status")),
      _.orderBy("l_orderkey", "l_linenumber", "l_partkey"),
      Some(
        """SELECT l_orderkey, l_linenumber, l_partkey,
          |       l_extendedprice * (1 - l_discount) AS revenue,
          |       l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
          |       l_returnflag || '/' || l_linestatus AS status
          |FROM lineitem ORDER BY l_orderkey, l_linenumber, l_partkey""".stripMargin)),

    // ── P1/§2.7: JSON payload field extraction ───────────────────────────
    QueryDef.sorted(
      "q04_json_extract",
      (s, dir) => EventLog.envelope(s, dir)
        .filter(col("document").isNotNull)
        .select(col("event_id"),
          get_json_object(col("document"), "$.k").cast("int").as("k")),
      _.orderBy("event_id"),
      Some(withEnvelope(
        """SELECT event_id, CAST(json_extract_string(document, '$.k') AS INTEGER) AS k
          |FROM envelope WHERE document IS NOT NULL ORDER BY event_id""".stripMargin))),

    // ── P4/T4/K1: last-writer-wins upsert (the sink's final state) ───────
    QueryDef.sorted(
      "q05_upsert_lww",
      (s, dir) => Upsert.liveDocuments(EventLog.envelope(s, dir))
        .select(col("id"), col("namespace"), col("version"),
          col("operation").as("last_op"),
          get_json_object(col("document"), "$.k").cast("int").as("k"),
          col("value")),
      _.orderBy(col("id").cast("long")),
      Some(withEnvelope(
        """, ranked AS (
          |  SELECT *, row_number() OVER (PARTITION BY namespace, id ORDER BY version DESC, event_id DESC) AS rn
          |  FROM envelope)
          |SELECT id, namespace, version, operation AS last_op,
          |       CAST(json_extract_string(document, '$.k') AS INTEGER) AS k, value
          |FROM ranked WHERE rn = 1 AND operation <> 'd'
          |ORDER BY CAST(id AS BIGINT)""".stripMargin))),

    // ── K2: tombstones (stateless delete strategy, version-protected) ────
    QueryDef.sorted(
      "q06_tombstones",
      (s, dir) => Upsert.tombstones(EventLog.envelope(s, dir))
        .select(col("id"), col("namespace"), col("version")),
      _.orderBy(col("id").cast("long")),
      Some(withEnvelope(
        """, ranked AS (
          |  SELECT *, row_number() OVER (PARTITION BY namespace, id ORDER BY version DESC, event_id DESC) AS rn
          |  FROM envelope)
          |SELECT id, namespace, version
          |FROM ranked WHERE rn = 1 AND operation = 'd'
          |ORDER BY CAST(id AS BIGINT)""".stripMargin))),

    // ── K7/P3: index-name + routing resolution ───────────────────────────
    QueryDef.sorted(
      "q07_index_routing",
      (s, dir) => {
        val mapping = Map("app.t0" -> "users_primary")
        Routing.withMeta(EventLog.envelope(s, dir), mapping,
            routing = Some((col("id").cast("long") % 8).cast("string")))
          .groupBy("namespace", "meta_index")
          .agg(count(lit(1)).as("n"),
            countDistinct(col("meta_routing")).as("n_shards"))
      },
      _.orderBy("namespace"),
      Some(withEnvelope(
        """SELECT namespace,
          |       CASE WHEN namespace = 'app.t0' THEN 'users_primary' ELSE lower(namespace) END AS meta_index,
          |       count(*) AS n,
          |       count(DISTINCT CAST(CAST(id AS BIGINT) % 8 AS VARCHAR)) AS n_shards
          |FROM envelope
          |WHERE id IS NOT NULL AND length(id) > 0 AND length(id) <= 512
          |GROUP BY 1, 2 ORDER BY namespace""".stripMargin))),

    // ── P5: oplog date injection (Go layout → JVM pattern) ───────────────
    QueryDef.sorted(
      "q08_oplog_date",
      (s, dir) => EventLog.envelope(s, dir)
        .select(col("event_id"),
          date_format(timestamp_micros(col("ts_us")),
            Codecs.DefaultOplogDateFormat).as("oplog_date"),
          col("ts_us").as("oplog_ts")),
      _.orderBy("event_id"),
      Some(withEnvelope(
        """SELECT event_id,
          |       strftime(make_timestamp(ts_us), '%Y/%m/%d %H:%M:%S') AS oplog_date,
          |       ts_us AS oplog_ts
          |FROM envelope ORDER BY event_id""".stripMargin))),

    // ── P6: _id canonicalization (whole floats collapse) ─────────────────
    QueryDef.sorted(
      "q09_id_canon",
      (s, dir) => s.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_quantity"),
          Codecs.numericIdToString(col("l_quantity")).as("canon_id"))
        .distinct(),
      _.orderBy("l_quantity"),
      Some(
        """SELECT DISTINCT l_quantity,
          |       CASE WHEN l_quantity = floor(l_quantity)
          |            THEN CAST(CAST(l_quantity AS BIGINT) AS VARCHAR)
          |            ELSE CAST(l_quantity AS VARCHAR) END AS canon_id
          |FROM lineitem ORDER BY l_quantity""".stripMargin)),

    // ── P7: invalid-JSON pruning (NaN / ±Inf → null) ─────────────────────
    QueryDef.sorted(
      "q10_prune_invalid",
      (s, dir) => {
        val raw = s.read.parquet(s"$dir/events.parquet")
          .withColumn("v",
            when(col("event_id") % 97 === 0, lit("NaN").cast("double"))
              .when(col("event_id") % 101 === 0, lit("Infinity").cast("double"))
              .otherwise(col("value")))
        raw.select(col("event_id"),
            Codecs.pruneInvalidDouble(col("v")).as("pruned"),
            (isnan(col("v")) || abs(col("v")) === lit(Double.PositiveInfinity))
              .as("was_pruned"))
      },
      _.orderBy("event_id"),
      Some(
        """WITH raw AS (
          |  SELECT event_id,
          |         CASE WHEN event_id % 97 = 0 THEN CAST('NaN' AS DOUBLE)
          |              WHEN event_id % 101 = 0 THEN CAST('Infinity' AS DOUBLE)
          |              ELSE value END AS v
          |  FROM events)
          |SELECT event_id,
          |       CASE WHEN isnan(v) OR abs(v) = CAST('Infinity' AS DOUBLE) THEN NULL ELSE v END AS pruned,
          |       (isnan(v) OR abs(v) = CAST('Infinity' AS DOUBLE)) AS was_pruned
          |FROM raw ORDER BY event_id""".stripMargin)),

    // ── P7 recursive: prune NaN/Inf and out-of-range dates INSIDE docs
    // (fixPruneInvalidJSON walks maps/slices, monstache.go:878-950). The
    // fixture builds a nested doc {"k":int, "n":{"w":num}, "t":iso}:
    // w is NaN / Infinity / a whole double by event_id mod 3 (Spark's
    // JSON writer quotes non-finite doubles, so the invalid cases arrive
    // as the "NaN"/"Infinity" strings the pruner recognizes); t's year
    // overflows 9999 on odd events. The oracle constructs the pruned
    // canonical document textually.
    QueryDef.sorted(
      "q49_prune_recursive",
      (s, dir) => {
        val ev = s.read.parquet(s"$dir/events.parquet")
        val k = (col("event_id") % 50).cast("int")
        val w = when(col("event_id") % 3 === 0, lit(Double.NaN))
          .when(col("event_id") % 3 === 1, lit(Double.PositiveInfinity))
          .otherwise((k + 1).cast("double"))
        val ts = timestamp_micros(
          graft.source.EventLog.tsUsOf(ev) + (col("event_id") % 2) * 300000000000000000L)
        val doc = to_json(struct(
          k.as("k"),
          struct(w.as("w")).as("n"),
          concat(date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSS"), lit("Z")).as("t")))
        ev.select(col("event_id"),
          graft.codec.PruneInvalidJson.pruneCol(doc).as("pruned"))
      },
      _.orderBy("event_id"),
      Some(
        """WITH f AS (
          |  SELECT event_id,
          |         CAST(event_id % 50 AS INTEGER) AS k,
          |         (event_id % 3) AS wm,
          |         CAST(CAST(event_id % 50 AS INTEGER) + 1 AS DOUBLE) AS wv,
          |         make_timestamp(epoch_us(ts) + (event_id % 2) * 300000000000000000) AS big_ts
          |  FROM events)
          |SELECT event_id,
          |       '{"k":' || k ||
          |       ',"n":{' || CASE WHEN wm = 2 THEN '"w":' || CAST(wv AS VARCHAR) ELSE '' END || '}' ||
          |       CASE WHEN year(big_ts) BETWEEN 0 AND 9999
          |            THEN ',"t":"' || strftime(big_ts, '%Y-%m-%dT%H:%M:%S.%g') || 'Z"'
          |            ELSE '' END ||
          |       '}' AS pruned
          |FROM f ORDER BY event_id""".stripMargin)),

    // ── P6/P8: BSON id + date codecs over a mixed-type id fixture.
    // Every 5th user gets a different id shape (numeric, ObjectID-hex,
    // UUID, base64-binary, plain string), derived from md5 so the binary
    // round-trip (unhex → codec) is provable against the oracle's direct
    // string slicing. Dates: ISO-millis with the year-[0,9999] validity
    // rule — the +3e17µs/+6e17µs shifted rows land past year 9999 → null.
    QueryDef.sorted(
      "q28_bson_codecs",
      (s, dir) => {
        val ev = s.read.parquet(s"$dir/events.parquet")
          .withColumn("kind", col("user_id") % 5)
          .withColumn("md", md5(col("user_id").cast("string")))
        val canonical = when(col("kind") === 0, col("user_id").cast("string"))
          .when(col("kind") === 1,
            Codecs.objectIdHex(unhex(substring(col("md"), 1, 24))))
          .when(col("kind") === 2, Codecs.binaryToUuid(unhex(col("md"))))
          .when(col("kind") === 3,
            Codecs.binaryToBase64(unhex(substring(col("md"), 1, 16))))
          .otherwise(concat(lit("u"), col("user_id")))
        val bigTs = timestamp_micros(
          graft.source.EventLog.tsUsOf(ev) + (col("event_id") % 3) * 300000000000000000L)
        ev.select(col("event_id"), col("kind"), canonical.as("canon_id"),
            Codecs.idAccepted(canonical).as("id_ok"),
            Codecs.bsonDateString(bigTs).as("bson_date"))
      },
      _.orderBy("event_id"),
      Some(
        """WITH ev AS (
          |  SELECT event_id, user_id % 5 AS kind,
          |         md5(CAST(user_id AS VARCHAR)) AS md,
          |         user_id, epoch_us(ts) AS ts_us
          |  FROM events),
          |canon AS (
          |  SELECT event_id, kind,
          |         CASE WHEN kind = 0 THEN CAST(user_id AS VARCHAR)
          |              WHEN kind = 1 THEN substr(md, 1, 24)
          |              WHEN kind = 2 THEN concat_ws('-', substr(md,1,8), substr(md,9,4), substr(md,13,4), substr(md,17,4), substr(md,21,12))
          |              WHEN kind = 3 THEN to_base64(unhex(substr(md, 1, 16)))
          |              ELSE 'u' || CAST(user_id AS VARCHAR) END AS canon_id,
          |         make_timestamp(ts_us + (event_id % 3) * 300000000000000000) AS big_ts
          |  FROM ev)
          |SELECT event_id, kind, canon_id,
          |       (canon_id IS NOT NULL AND length(canon_id) > 0 AND octet_length(encode(canon_id)) <= 512) AS id_ok,
          |       CASE WHEN year(big_ts) BETWEEN 0 AND 9999
          |            THEN strftime(big_ts, '%Y-%m-%dT%H:%M:%S.%g') || 'Z' END AS bson_date
          |FROM canon ORDER BY event_id""".stripMargin)),

    // ── P4: cluster-time version bit packing ─────────────────────────────
    QueryDef.sorted(
      "q11_version_pack",
      (s, dir) => EventLog.envelope(s, dir)
        .withColumn("ts_t", expr("ts_us div 1000000"))
        .withColumn("ts_i", col("event_id") % 4096)
        .select(col("event_id"), col("ts_t"), col("ts_i"),
          Codecs.tsVersion(col("ts_t"), col("ts_i"), col("operation"))
            .as("ext_version")),
      _.orderBy("event_id"),
      Some(withEnvelope(
        """SELECT event_id,
          |       ts_us // 1000000 AS ts_t,
          |       event_id % 4096 AS ts_i,
          |       (ts_us // 1000000) * 4294967296 + (event_id % 4096)
          |         + (CASE operation WHEN 'u' THEN 1 WHEN 'd' THEN 2 ELSE 0 END) AS ext_version
          |FROM envelope ORDER BY event_id""".stripMargin))),

    // ── K4: time-machine dated history index ─────────────────────────────
    QueryDef.sorted(
      "q12_time_machine",
      (s, dir) => TimeMachine.history(
          EventLog.envelope(s, dir), Seq("app.t1", "app.t2"))
        .select(col("event_id"), col("id").as("source_id"),
          col("version"), col("history_index")),
      _.orderBy("event_id"),
      Some(withEnvelope(
        """SELECT event_id, id AS source_id, version,
          |       'log' || '.' || lower(namespace) || '.' ||
          |         strftime(make_timestamp(ts_us), '%Y-%m-%d') AS history_index
          |FROM envelope
          |WHERE namespace IN ('app.t1', 'app.t2') AND operation IN ('i','u','d')
          |ORDER BY event_id""".stripMargin))),

    // ── P10: merge-patch log pair construction + version numbering ───────
    QueryDef.sorted(
      "q13_patch_pairs",
      (s, dir) => PatchLog.pairs(EventLog.envelope(s, dir), Seq("app.t1"))
        .select(col("id"), col("v"), col("version"),
          get_json_object(col("prev_document"), "$.k").cast("int").as("prev_k"),
          get_json_object(col("document"), "$.k").cast("int").as("new_k")),
      // (id, v) stopped being total once delete epochs renumber chains
      // from 1 — version is the per-key total order
      _.orderBy(col("id").cast("long"), col("version")),
      Some(withEnvelope(
        """, fenced AS (
          |  SELECT *, sum(CASE WHEN operation = 'd' THEN 1 ELSE 0 END)
          |    OVER (PARTITION BY namespace, id ORDER BY version ASC, event_id ASC
          |          ROWS UNBOUNDED PRECEDING) AS epoch
          |  FROM envelope
          |  WHERE namespace = 'app.t1'
          |    AND ((operation IN ('i','u') AND document IS NOT NULL)
          |         OR operation = 'd')),
          |patchable AS (SELECT * FROM fenced WHERE operation IN ('i','u'))
          |SELECT id,
          |       row_number() OVER (PARTITION BY namespace, id, epoch ORDER BY version ASC, event_id ASC) AS v,
          |       version,
          |       CAST(json_extract_string(lag(document) OVER (PARTITION BY namespace, id, epoch ORDER BY version ASC, event_id ASC), '$.k') AS INTEGER) AS prev_k,
          |       CAST(json_extract_string(document, '$.k') AS INTEGER) AS new_k
          |FROM patchable
          |ORDER BY CAST(id AS BIGINT), version""".stripMargin))),

    // ── K2 stateful delete strategy: docs indexed with routing/index
    // overrides save their meta (shouldSave); a later delete consults the
    // meta store and falls back to default resolution without it.
    QueryDef.sorted(
      "q18_delete_stateful",
      (s, dir) => {
        val env = EventLog.envelope(s, dir)
        val k = get_json_object(col("document"), "$.k").cast("int")
        val metaStore = env
          .filter(col("namespace") === "app.t0" &&
            col("operation").isin("i", "u") && k % 4 === 0)
          .select(col("namespace"), col("id")).distinct()
          .withColumn("saved_index", lit("routed_t0"))
          .withColumn("saved_routing", concat(lit("r"), col("id").cast("long") % 8))
        DeleteStrategies.stateful(Upsert.tombstones(env), metaStore)
          .select(col("id"), col("namespace"), col("version"),
            col("meta_index"), col("meta_routing"))
      },
      _.orderBy(col("id").cast("long")),
      Some(withEnvelope(
        """, meta_store AS (
          |  SELECT DISTINCT namespace, id, 'routed_t0' AS saved_index,
          |         'r' || CAST(CAST(id AS BIGINT) % 8 AS VARCHAR) AS saved_routing
          |  FROM envelope
          |  WHERE namespace = 'app.t0' AND operation IN ('i','u')
          |    AND CAST(json_extract_string(document, '$.k') AS INTEGER) % 4 = 0),
          |ranked AS (
          |  SELECT *, row_number() OVER (PARTITION BY namespace, id ORDER BY version DESC, event_id DESC) AS rn
          |  FROM envelope),
          |tombs AS (SELECT id, namespace, version FROM ranked WHERE rn = 1 AND operation = 'd')
          |SELECT t.id, t.namespace, t.version,
          |       coalesce(lower(m.saved_index), lower(t.namespace)) AS meta_index,
          |       coalesce(m.saved_routing, t.id) AS meta_routing
          |FROM tombs t LEFT JOIN meta_store m
          |  ON t.namespace = m.namespace AND t.id = m.id
          |ORDER BY CAST(t.id AS BIGINT)""".stripMargin))),

    // ── K2 stateless-routed + J2 recovery: a delete knows only its id.
    // The sink state is searched for the unique matching doc (two copies
    // of every 100th order make those ambiguous → refused, the delete
    // protection); resolved deletes recover the customer key from the
    // last-known doc and propagate a delete to the related namespace.
    QueryDef.sorted(
      "q19_delete_recovery",
      (s, dir) => {
        val orders = s.read.parquet(s"$dir/orders.parquet")
        val deletes = orders.filter(col("o_orderkey") % 10 === 0)
          .select(col("o_orderkey").cast("string").as("id"))
        val state = orders.select(col("o_orderkey").cast("string").as("id"),
            col("o_custkey"), lit("app.orders").as("meta_index"))
          .unionByName(orders.filter(col("o_orderkey") % 100 === 0)
            .select(col("o_orderkey").cast("string").as("id"),
              col("o_custkey"), lit("app.orders_v2").as("meta_index")))
          .withColumn("meta_routing", col("id"))
        val searched = DeleteStrategies.statelessRouted(deletes, state)
        val resolvedKeys = searched.filter(col("status") === "deleted")
          .join(orders.select(col("o_orderkey").cast("string").as("id"),
            col("o_custkey")), Seq("id"))
        val customer = s.read.parquet(s"$dir/customer.parquet")
        val propagated = resolvedKeys
          .join(customer, col("o_custkey") === col("c_custkey"))
          .select(col("id"), col("c_custkey"))
        searched.join(propagated, Seq("id"), "left")
          .select(col("id").cast("long").as("order_id"), col("n_hits"),
            col("status"), col("c_custkey").cast("long"))
      },
      _.orderBy("order_id"),
      Some(
        """WITH deletes AS (
          |  SELECT CAST(o_orderkey AS VARCHAR) AS id FROM orders WHERE o_orderkey % 10 = 0),
          |state AS (
          |  SELECT CAST(o_orderkey AS VARCHAR) AS id, o_custkey FROM orders
          |  UNION ALL
          |  SELECT CAST(o_orderkey AS VARCHAR), o_custkey FROM orders WHERE o_orderkey % 100 = 0),
          |hits AS (SELECT id, count(*) AS n_hits FROM state GROUP BY id),
          |searched AS (
          |  SELECT d.id, coalesce(h.n_hits, 0) AS n_hits,
          |         CASE WHEN coalesce(h.n_hits, 0) = 1 THEN 'deleted' ELSE 'refused' END AS status
          |  FROM deletes d LEFT JOIN hits h ON d.id = h.id),
          |prop AS (
          |  SELECT s.id, c.c_custkey
          |  FROM searched s
          |  JOIN orders o ON CAST(o.o_orderkey AS VARCHAR) = s.id
          |  JOIN customer c ON o.o_custkey = c.c_custkey
          |  WHERE s.status = 'deleted')
          |SELECT CAST(s.id AS BIGINT) AS order_id, s.n_hits, s.status,
          |       CAST(p.c_custkey AS BIGINT) AS c_custkey
          |FROM searched s LEFT JOIN prop p ON s.id = p.id
          |ORDER BY order_id""".stripMargin)),

    // ── P10: RFC-7386 merge-patch log. Docs are enriched to three fields
    // (b from the value, k from the payload, x present only when k%5≠0 so
    // removals occur); patch v1 = full doc on insert, later patches carry
    // changed keys and removed→null, all in canonical sorted-key compact
    // form. The oracle constructs the same patches textually.
    QueryDef.sorted(
      "q17_merge_patch",
      (s, dir) => {
        val diffUdf = udf((prev: String, curr: String) =>
          graft.codec.JsonMergePatch.diff(prev, curr))
        val canonUdf = udf((doc: String) =>
          graft.codec.JsonMergePatch.canonicalJson(doc))
        val base = EventLog.envelope(s, dir)
          .filter(col("namespace") === "app.t1" && col("operation").isin("i", "u"))
          .withColumn("k", get_json_object(col("document"), "$.k").cast("int"))
          .withColumn("doc", to_json(struct(
            floor(col("value")).cast("int").as("b"),
            col("k"),
            when(col("k") % 5 =!= 0, col("k") % 7).as("x"))))
        val w = Window.partitionBy(col("id"))
          .orderBy(col("version").asc, col("event_id").asc)
        base.withColumn("v", row_number().over(w))
          .withColumn("prev_doc", lag(col("doc"), 1).over(w))
          .withColumn("patch",
            when(col("prev_doc").isNull, canonUdf(col("doc")))
              .otherwise(diffUdf(col("prev_doc"), col("doc"))))
          .select(col("id"), col("v"), col("patch"))
      },
      _.orderBy(col("id").cast("long"), col("v")),
      Some(withEnvelope(
        """, enriched AS (
          |  SELECT namespace, id, version, event_id,
          |         CAST(floor(value) AS INTEGER) AS b,
          |         CAST(json_extract_string(document, '$.k') AS INTEGER) AS k,
          |         CASE WHEN CAST(json_extract_string(document, '$.k') AS INTEGER) % 5 <> 0
          |              THEN CAST(json_extract_string(document, '$.k') AS INTEGER) % 7 END AS x
          |  FROM envelope
          |  WHERE namespace = 'app.t1' AND operation IN ('i','u')),
          |laged AS (
          |  SELECT id,
          |         row_number() OVER (PARTITION BY namespace, id ORDER BY version ASC, event_id ASC) AS v,
          |         b, k, x,
          |         lag(b) OVER (PARTITION BY namespace, id ORDER BY version ASC, event_id ASC) AS pb,
          |         lag(k) OVER (PARTITION BY namespace, id ORDER BY version ASC, event_id ASC) AS pk,
          |         lag(x) OVER (PARTITION BY namespace, id ORDER BY version ASC, event_id ASC) AS px
          |  FROM enriched)
          |SELECT id, v,
          |       CASE WHEN v = 1 THEN
          |         '{"b":' || b || ',"k":' || k ||
          |         (CASE WHEN x IS NOT NULL THEN ',"x":' || x ELSE '' END) || '}'
          |       ELSE
          |         '{' || concat_ws(',',
          |           CASE WHEN b <> pb THEN '"b":' || b END,
          |           CASE WHEN k <> pk THEN '"k":' || k END,
          |           CASE WHEN x IS NOT NULL AND (px IS NULL OR x <> px) THEN '"x":' || x
          |                WHEN x IS NULL AND px IS NOT NULL THEN '"x":null' END) || '}'
          |       END AS patch
          |FROM laged
          |ORDER BY CAST(id AS BIGINT), v""".stripMargin))),

    // ── P3 doc-embedded: every k%4==0 doc carries `_meta_monstache`
    // (index/routing/version overrides) INSIDE the document; extraction
    // pulls the overrides into m_meta_* and strips the key before
    // indexing (parseIndexMeta, monstache.go:1377-1403) — the oracle
    // reconstructs both the resolved meta and the stripped doc.
    QueryDef.sorted(
      "q55_doc_meta",
      (s, dir) => {
        val env = EventLog.envelope(s, dir)
          .filter(col("operation").isin("i", "u"))
          .withColumn("k", get_json_object(col("document"), "$.k").cast("int"))
        val doc = when(col("k") % 4 === 0,
            to_json(struct(
              struct(lit("ix_override").as("index"),
                concat(lit("r"), col("k") % 8).as("routing"),
                (col("version") + 1000L).as("version")).as("_meta_monstache"),
              col("k"))))
          .otherwise(to_json(struct(col("k"))))
        Routing.withMeta(Routing.extractDocMeta(env.withColumn("document", doc)))
          .select(col("event_id"), col("meta_index"), col("meta_routing"),
            col("meta_version"), col("document"))
      },
      _.orderBy("event_id"),
      Some(withEnvelope(
        """, en AS (
          |  SELECT event_id, id, namespace, version,
          |         CAST(json_extract_string(document, '$.k') AS INTEGER) AS k
          |  FROM envelope WHERE operation IN ('i','u'))
          |SELECT event_id,
          |       CASE WHEN k % 4 = 0 THEN 'ix_override' ELSE lower(namespace) END AS meta_index,
          |       CASE WHEN k % 4 = 0 THEN 'r' || CAST(k % 8 AS VARCHAR) ELSE id END AS meta_routing,
          |       CASE WHEN k % 4 = 0 THEN version + 1000 ELSE version END AS meta_version,
          |       '{"k":' || k || '}' AS document
          |FROM en ORDER BY event_id""".stripMargin))),

    // ── K1 index-as-update: doc-as-upsert partial merge. Updates carry
    // field x only when k%5≠0, so the merged doc must keep x from the
    // last update that HAD it while b/k advance to the newest values —
    // the BulkUpdateRequest merge the reference switches to under
    // `index-as-update` (monstache.go:3203-3215).
    QueryDef.sorted(
      "q50_index_as_update",
      (s, dir) => {
        val k = get_json_object(col("document"), "$.k").cast("int")
        val enriched = EventLog.envelope(s, dir)
          .filter(col("namespace") === "app.t1")
          .withColumn("b", floor(col("value")).cast("int"))
          .withColumn("k", k)
          .withColumn("x", when(k % 5 =!= 0, k % 7))
        Upsert.indexAsUpdate(enriched, Seq("b", "k", "x"))
      },
      _.orderBy(col("id").cast("long")),
      Some(withEnvelope(
        """, en AS (
          |  SELECT namespace, id, version, event_id, operation,
          |         CAST(floor(value) AS INTEGER) AS b,
          |         CAST(json_extract_string(document, '$.k') AS INTEGER) AS k,
          |         CASE WHEN CAST(json_extract_string(document, '$.k') AS INTEGER) % 5 <> 0
          |              THEN CAST(json_extract_string(document, '$.k') AS INTEGER) % 7 END AS x
          |  FROM envelope
          |  WHERE namespace = 'app.t1' AND operation IN ('i','u','d')),
          |keyed AS (
          |  SELECT *, lpad(CAST(version AS VARCHAR), 20, '0')
          |         || lpad(CAST(event_id AS VARCHAR), 10, '0') AS ord
          |  FROM en),
          |del AS (
          |  SELECT namespace, id, max(ord) AS dord FROM keyed
          |  WHERE operation = 'd' GROUP BY namespace, id),
          |merged AS (
          |  SELECT k.namespace, k.id,
          |         arg_max(b, ord) FILTER (WHERE operation IN ('i','u')
          |           AND b IS NOT NULL AND (dord IS NULL OR ord > dord)) AS b,
          |         arg_max(k.k, ord) FILTER (WHERE operation IN ('i','u')
          |           AND k.k IS NOT NULL AND (dord IS NULL OR ord > dord)) AS k,
          |         arg_max(x, ord) FILTER (WHERE operation IN ('i','u')
          |           AND x IS NOT NULL AND (dord IS NULL OR ord > dord)) AS x,
          |         max(version) FILTER (WHERE operation IN ('i','u'))
          |           AS merged_version
          |  FROM keyed k LEFT JOIN del USING (namespace, id)
          |  GROUP BY k.namespace, k.id)
          |SELECT * FROM merged WHERE merged_version IS NOT NULL
          |ORDER BY CAST(id AS BIGINT)""".stripMargin))),

    // ── §2.6: multi-source union fan-in (stream + direct read) ───────────
    QueryDef.sorted(
      "q14_union_fanin",
      (s, dir) => {
        val stream = EventLog.envelope(s, dir)
          .select(col("id"), col("namespace"), col("operation"),
            col("version"), col("source"))
        val direct = EventLog.directRead(s, dir, "orders", "o_orderkey", "app.orders")
          .select(col("id"), col("namespace"), col("operation"),
            col("version"), col("source"))
        stream.unionByName(direct)
          .groupBy("source", "namespace")
          .agg(count(lit(1)).as("n"), max(col("version")).as("max_version"))
      },
      _.orderBy("source", "namespace"),
      Some(withEnvelope(
        """, unioned AS (
          |  SELECT id, namespace, operation, version, source FROM envelope
          |  UNION ALL
          |  SELECT CAST(o_orderkey AS VARCHAR) AS id, 'app.orders' AS namespace,
          |         'i' AS operation, 0 AS version, 'direct_read' AS source
          |  FROM orders)
          |SELECT source, namespace, count(*) AS n, max(version) AS max_version
          |FROM unioned GROUP BY source, namespace ORDER BY source, namespace""".stripMargin))),

    // ── T2/T3: restart-merge semantics. A stream killed after the first
    // half of the ops and resumed over the second half must converge to
    // the same state as one uninterrupted pass: LWW(LWW(first) ∪ second)
    // == LWW(all). The Spark side computes the two-phase merge, the
    // oracle the single pass — a hash match proves resume correctness.
    QueryDef.sorted(
      "q16_restart_merge",
      (s, dir) => {
        val env = EventLog.envelope(s, dir)
        val run1 = Upsert.lastWriterWins(env.filter(col("event_id") <= 5000))
        val resumed = Upsert.lastWriterWins(
          run1.unionByName(env.filter(col("event_id") > 5000)))
        resumed.select(col("id"), col("operation"), col("version"))
      },
      _.orderBy(col("id").cast("long")),
      Some(withEnvelope(
        """, ranked AS (
          |  SELECT *, row_number() OVER (PARTITION BY namespace, id ORDER BY version DESC, event_id DESC) AS rn
          |  FROM envelope)
          |SELECT id, operation, version
          |FROM ranked WHERE rn = 1
          |ORDER BY CAST(id AS BIGINT)""".stripMargin))),

    // ── §2.10/F5/P1/P2/P11: namespace-keyed transform/filter registry ────
    // Two namespaces get different registered mappers: app.t0 replaces the
    // doc and overrides its index; app.t1 drops docs (k%3==0 → falsy), and
    // dropped updates become deletes with the +2 offset. A global filter
    // (k != 13) and a ns filter (app.t2: value > 10) run first.
    QueryDef.sorted(
      "q27_transform_registry",
      (s, dir) => {
        val reg = TransformRegistry(
          filters = Map(
            "" -> (get_json_object(col("document"), "$.k").cast("int") =!= 13),
            "app.t2" -> (col("value") > 10)),
          mappers = Map(
            "" -> (df => df.withColumn("k",
              get_json_object(col("document"), "$.k").cast("int"))),
            "app.t0" -> (df => df
              .withColumn("document", to_json(struct((col("k") * 2).as("k2"))))
              .withColumn("m_meta_index", lit("users_primary"))),
            "app.t1" -> (df => df.withColumn("m_drop", col("k") % 3 === 0))))
        Routing.withMeta(reg(EventLog.envelope(s, dir), materializeInput = true))
          .groupBy("namespace", "operation", "meta_index")
          .agg(count(lit(1)).as("n"),
            sum(col("k")).as("sum_k"),
            count(col("document")).as("n_docs"))
      },
      _.orderBy("namespace", "operation", "meta_index"),
      Some(withEnvelope(
        """, flt AS (
          |  SELECT * FROM envelope
          |  WHERE NOT (operation IN ('i','u') AND document IS NOT NULL)
          |     OR (CAST(json_extract_string(document,'$.k') AS INTEGER) != 13
          |         AND (namespace <> 'app.t2' OR value > 10))),
          |mapped AS (
          |  SELECT namespace, operation, document,
          |         CASE WHEN operation IN ('i','u') AND document IS NOT NULL
          |              THEN CAST(json_extract_string(document,'$.k') AS INTEGER) END AS k,
          |         (namespace = 'app.t1' AND operation IN ('i','u') AND document IS NOT NULL
          |          AND CAST(json_extract_string(document,'$.k') AS INTEGER) % 3 = 0) AS m_drop,
          |         CASE WHEN namespace = 'app.t0' AND operation IN ('i','u') AND document IS NOT NULL
          |              THEN 'users_primary' END AS m_meta_index
          |  FROM flt),
          |fin AS (
          |  SELECT namespace,
          |         CASE WHEN m_drop AND operation = 'u' THEN 'd' ELSE operation END AS operation,
          |         CASE WHEN m_drop THEN NULL ELSE document END AS document,
          |         k,
          |         coalesce(m_meta_index, lower(namespace)) AS meta_index
          |  FROM mapped
          |  WHERE NOT (m_drop AND operation = 'i'))
          |SELECT namespace, operation, meta_index,
          |       count(*) AS n,
          |       CAST(sum(k) AS BIGINT) AS sum_k,
          |       count(document) AS n_docs
          |FROM fin
          |GROUP BY namespace, operation, meta_index
          |ORDER BY namespace, operation, meta_index""".stripMargin))),

    // ── F4/K3: drop ops end-to-end. The envelope emits dropCollection /
    // dropDatabase ops; the drop-regex pair admits app drops but excludes
    // legacy.* drops (F4 all four branches live); index survival follows
    // doDrop semantics — an index survives iff data ops outlive its last
    // covering drop.
    QueryDef.sorted(
      "q29_drop_propagation",
      (s, dir) => {
        val ops = NamespaceFilter(EventLog.envelopeWithDrops(s, dir),
          NamespaceFilterConfig(dropInclude = Some("^app(\\..*)?$"),
            dropExclude = Some("^app\\.t3$")))
        DropPropagation.indexSurvival(ops)
          .select(col("ix"), col("last_drop_version"), col("n_ops"),
            col("max_version"), col("n_after_drop"), col("survives"))
      },
      _.orderBy("ix"),
      Some(
        s"""WITH ${EventLog.oracleCteWithDrops},
           |flt AS (
           |  SELECT * FROM envd
           |  WHERE operation NOT IN ('drop_coll','drop_db')
           |     OR (regexp_matches(namespace, '^app(\\..*)?$$')
           |         AND NOT regexp_matches(namespace, '^app\\.t3$$'))),
           |data AS (SELECT lower(namespace) AS ix, version FROM flt
           |         WHERE operation IN ('i','u','d')),
           |drops AS (SELECT operation AS d_op, namespace AS d_ns, db AS d_db,
           |                 version AS d_version
           |          FROM flt WHERE operation IN ('drop_coll','drop_db')),
           |ld AS (SELECT ix, max(d_version) AS last_drop_version
           |       FROM (SELECT DISTINCT ix FROM data) dx
           |       LEFT JOIN drops ON (d_op = 'drop_coll' AND lower(d_ns) = dx.ix)
           |                       OR (d_op = 'drop_db' AND dx.ix LIKE d_db || '.%')
           |       GROUP BY ix),
           |j AS (SELECT data.ix, data.version, ld.last_drop_version
           |      FROM data LEFT JOIN ld USING (ix))
           |SELECT ix, last_drop_version, count(*) AS n_ops, max(version) AS max_version,
           |       CAST(sum(CASE WHEN version > coalesce(last_drop_version, -1) THEN 1 ELSE 0 END) AS BIGINT) AS n_after_drop,
           |       (sum(CASE WHEN version > coalesce(last_drop_version, -1) THEN 1 ELSE 0 END) > 0) AS survives
           |FROM j GROUP BY ix, last_drop_version ORDER BY ix""".stripMargin)),

    // ── A3/K5: bulk-stats aggregation ────────────────────────────────────
    QueryDef.sorted(
      "q15_stats_agg",
      // K5 dated sink naming included: the flush's stats doc goes to a
      // daily index derived from the flush's own max cluster time
      // (monstache.go:3510-3527) — Stats.bulkStats is the one definition
      // the config front door serves too
      (s, dir) => Stats.bulkStats(EventLog.envelope(s, dir), dated = true),
      _.orderBy("namespace", "operation"),
      Some(withEnvelope(
        """SELECT namespace, operation, count(*) AS n_ops,
          |       CAST(sum(length(document)) AS BIGINT) AS doc_chars,
          |       min(version) AS min_version, max(version) AS max_version,
          |       'monstache.stats.' || strftime(make_timestamp(
          |         (SELECT max(ts_us) FROM envelope)), '%Y-%m-%d') AS stats_index
          |FROM envelope GROUP BY namespace, operation
          |ORDER BY namespace, operation""".stripMargin))),

    // ── T8: the flagship entry DAG itself as an oracle row — the full
    //    TOML-configured topology (SparkEntry.entryDag: envelope →
    //    namespace-regex chain → registry mapper → oplog-time injection →
    //    [[mapping]] routing → LWW live set) replayed relationally. The
    //    driver's t1 smoke pins rows>0; this pins every cell of the same
    //    DAG cross-engine, closing the one spec-only coverage row. ───────
    QueryDef.sorted(
      "q92_entry_dag",
      (s, dir) => graft.SparkEntry.entryDag(s, dir),
      _.orderBy(col("namespace"), col("meta_id").cast("long")),
      Some(withEnvelope(
        """, ranked AS (
          |  SELECT *, row_number() OVER (PARTITION BY namespace, id ORDER BY version DESC, event_id DESC) AS rn
          |  FROM envelope)
          |SELECT CASE WHEN namespace = 'app.t0' THEN 'users_primary'
          |            ELSE lower(namespace) END AS meta_index,
          |       id AS meta_id, id AS meta_routing, version AS meta_version,
          |       namespace, operation,
          |       CAST(json_extract_string(document, '$.k') AS INTEGER) AS k,
          |       value,
          |       strftime(make_timestamp(ts_us), '%Y/%m/%d %H:%M:%S') AS oplog_date
          |FROM ranked WHERE rn = 1 AND operation <> 'd'
          |ORDER BY namespace, CAST(id AS BIGINT)""".stripMargin))),

    // ── Gap-based sessionization (the classic event-stream islands):
    //    30-minute silence opens a new session; per-session rollup with
    //    all-integer micros. One per-user sort shared by both window
    //    functions; the oracle replays the identical total order. ───────
    QueryDef.sorted(
      "q140_sessionize",
      (s, dir) => {
        val ev = s.read.parquet(s"$dir/events.parquet")
        Sessionize.sessionStats(ev, gapUs = 1800L * 1000000L,
            tsUs = graft.source.EventLog.tsUsOf(ev))
          .select(col("user_id").cast("long"), col("session_seq"),
            col("n_events"), col("start_us"), col("end_us"), col("dur_us"))
      },
      _.orderBy("user_id", "session_seq"),
      Some(
        s"""WITH ${Sessionize.sqlSessionCtes("events", 1800L * 1000000L)}
           |SELECT CAST(user_id AS BIGINT) AS user_id,
           |       CAST(session_seq AS BIGINT) AS session_seq,
           |       CAST(count(*) AS BIGINT) AS n_events,
           |       CAST(min(ts_us) AS BIGINT) AS start_us,
           |       CAST(max(ts_us) AS BIGINT) AS end_us,
           |       CAST(max(ts_us) - min(ts_us) AS BIGINT) AS dur_us
           |FROM sess_s GROUP BY user_id, session_seq
           |ORDER BY user_id, session_seq""".stripMargin)),

    // ── Incremental sessionization (the log-ingest shape): the month of
    //    events folds through the state chain in three time-partitioned
    //    batches; closed sessions ∪ the final open state must equal the
    //    full-corpus session table EXACTLY, so q140's oracle is reused
    //    verbatim — the hash match IS the fold identity. ────────────────
    QueryDef.sorted(
      "q141_sessionize_incremental",
      (s, dir) => {
        val ev = s.read.parquet(s"$dir/events.parquet")
        // parse ONCE (the q158 shape): all three folds slice the same
        // persisted 3-column projection instead of re-scanning +
        // re-parsing the events parquet per fold
        val withTs = graft.CacheBarriers.barrier(
          ev.select(col("user_id"), col("event_id"),
            graft.source.EventLog.tsUsOf(ev).as("__t")))
        val gap = 1800L * 1000000L
        val cut1 = 1704931200000000L // 2024-01-11T00:00:00Z
        val cut2 = 1705795200000000L // 2024-01-21T00:00:00Z
        val (c1, st1) = Sessionize.sessionStatsIncremental(
          withTs.filter(col("__t") < cut1),
          Sessionize.emptySessionState(s), gap, col("__t"))
        val (c2, st2) = Sessionize.sessionStatsIncremental(
          withTs.filter(col("__t") >= cut1 && col("__t") < cut2), st1,
          gap, col("__t"))
        val (c3, st3) = Sessionize.sessionStatsIncremental(
          withTs.filter(col("__t") >= cut2), st2, gap, col("__t"))
        c1.unionByName(c2).unionByName(c3).unionByName(st3)
          .select(col("user_id").cast("long"), col("session_seq"),
            col("n_events"), col("start_us"), col("end_us"), col("dur_us"))
      },
      _.orderBy("user_id", "session_seq"),
      Some(
        s"""WITH ${Sessionize.sqlSessionCtes("events", 1800L * 1000000L)}
           |SELECT CAST(user_id AS BIGINT) AS user_id,
           |       CAST(session_seq AS BIGINT) AS session_seq,
           |       CAST(count(*) AS BIGINT) AS n_events,
           |       CAST(min(ts_us) AS BIGINT) AS start_us,
           |       CAST(max(ts_us) AS BIGINT) AS end_us,
           |       CAST(max(ts_us) - min(ts_us) AS BIGINT) AS dur_us
           |FROM sess_s GROUP BY user_id, session_seq
           |ORDER BY user_id, session_seq""".stripMargin)),

    // ── Ordered conversion funnel: signup → view → click → purchase,
    //    each step gated on the user's earliest completion of the
    //    previous one WITHIN a 3-day conversion window (150 → 105 → 79
    //    → 55 users — a discriminating funnel, not a saturated one);
    //    the chain is user-keyed min-aggregations sharing one
    //    co-partitioning, the report a steps-sized frame. ───────────────
    QueryDef.sorted(
      "q142_event_funnel",
      (s, dir) => {
        val ev = s.read.parquet(s"$dir/events.parquet")
        EventAnalytics.funnel(ev,
          Seq("signup", "view", "click", "purchase"),
          tsUs = graft.source.EventLog.tsUsOf(ev),
          withinUs = Some(3L * 86400000000L))
      },
      _.orderBy("step_idx"),
      Some {
        val steps = Seq("signup", "view", "click", "purchase")
        val rep = steps.zipWithIndex.map { case (st, i) =>
          val prev = if (i == 0) "fstep_0" else s"fstep_${i - 1}"
          s"SELECT $i AS step_idx, '$st' AS step, " +
            s"(SELECT count(*) FROM fstep_$i) AS n_users, " +
            s"(SELECT count(*) FROM $prev) AS np"
        }.mkString("\n  UNION ALL\n  ")
        s"""WITH ${EventAnalytics.sqlFunnelCtes("events", steps,
            withinUs = Some(3L * 86400000000L))},
           |rep AS (
           |  $rep)
           |SELECT CAST(step_idx AS BIGINT) AS step_idx, step,
           |       CAST(n_users AS BIGINT) AS n_users,
           |       CAST(n_users * 1000000 //
           |            greatest((SELECT count(*) FROM fstep_0), 1) AS BIGINT)
           |         AS conv_total_micro,
           |       CAST(n_users * 1000000 // greatest(np, 1) AS BIGINT)
           |         AS conv_step_micro
           |FROM rep ORDER BY step_idx""".stripMargin
      }),

    // ── Retention cohort triangle: users cohorted by first active UTC
    //    day, counted at each later active-day offset — two integer-day
    //    aggregations, the per-user min riding the distinct's own
    //    partitioning. ─────────────────────────────────────────────────
    QueryDef.sorted(
      "q143_retention_cohorts",
      (s, dir) => {
        val ev = s.read.parquet(s"$dir/events.parquet")
        EventAnalytics.retentionCohorts(ev,
          tsUs = graft.source.EventLog.tsUsOf(ev))
      },
      _.orderBy("cohort_day", "offset_days"),
      Some(
        """WITH d AS (
          |  SELECT DISTINCT user_id AS u,
          |         epoch_us(ts) // 86400000000 AS day
          |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
          |c AS (SELECT u, day,
          |             min(day) OVER (PARTITION BY u) AS cohort_day
          |      FROM d)
          |SELECT CAST(cohort_day AS BIGINT) AS cohort_day,
          |       CAST(day - cohort_day AS BIGINT) AS offset_days,
          |       CAST(count(*) AS BIGINT) AS n_users
          |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ── Table profile (the pre-pipeline data-quality card): per-column
    //    null/distinct/blank counts for the events table — exact, one
    //    Expand-planned pass, never a per-column rescan. ────────────────
    QueryDef.sorted(
      "q148_table_profile",
      (s, dir) => Profile.tableProfile(
        s.read.parquet(s"$dir/events.parquet"),
        Seq("event_id", "user_id", "event_type", "value", "props")),
      _.orderBy("column"),
      Some {
        def row(c: String, dt: String, blank: Boolean) = {
          val nb = if (blank)
            s"(SELECT count(*) FROM events WHERE trim($c) = '')"
          else "CAST(NULL AS BIGINT)"
          s"""SELECT '$c' AS "column", '$dt' AS dtype,
             |  (SELECT count(*) FROM events) AS n_rows,
             |  (SELECT count(*) FROM events WHERE $c IS NULL) AS n_nulls,
             |  (SELECT count(DISTINCT $c) FROM events) AS n_distinct,
             |  $nb AS n_blank""".stripMargin
        }
        Seq(row("event_id", "bigint", blank = false),
          row("user_id", "bigint", blank = false),
          row("event_type", "string", blank = true),
          row("value", "double", blank = false),
          row("props", "string", blank = true))
          .mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")
      }),

    // ── Join-key skew report (the salting decision's input): the 10
    //    heaviest user_id keys with corpus shares — a key census plus a
    //    bounded TakeOrdered, never a full sort. ────────────────────────
    QueryDef.sorted(
      "q149_key_skew",
      (s, dir) => Profile.keySkew(
        s.read.parquet(s"$dir/events.parquet"), "user_id", k = 10),
      _.orderBy("rank"),
      Some(
        """WITH c AS (SELECT CAST(user_id AS VARCHAR) AS key, count(*) AS n
          |           FROM events GROUP BY 1),
          |r AS (SELECT key, n,
          |             row_number() OVER (ORDER BY n DESC, key ASC NULLS FIRST)
          |               AS rank
          |      FROM c)
          |SELECT CAST(rank AS BIGINT) AS rank, key, CAST(n AS BIGINT) AS n,
          |       CAST(n * 1000000 //
          |            greatest((SELECT count(*) FROM events), 1) AS BIGINT)
          |         AS share_micro
          |FROM r WHERE rank <= 10 ORDER BY rank""".stripMargin)),

    // ── Event transition matrix (the empirical Markov kernel): per-user
    //    consecutive pairs via one windowed lag, cells with exact
    //    from-row shares. ──────────────────────────────────────────────
    QueryDef.sorted(
      "q151_transition_matrix",
      (s, dir) => {
        val ev = s.read.parquet(s"$dir/events.parquet")
        EventAnalytics.transitionMatrix(ev,
          tsUs = graft.source.EventLog.tsUsOf(ev))
      },
      _.orderBy("from_type", "to_type"),
      Some(
        """WITH e AS (
          |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
          |  FROM events
          |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
          |    AND event_type IS NOT NULL),
          |p AS (SELECT event_type AS to_type,
          |             lag(event_type) OVER (PARTITION BY user_id
          |               ORDER BY ts_us, event_id) AS from_type
          |      FROM e),
          |c AS (SELECT from_type, to_type, count(*) AS n FROM p
          |      WHERE from_type IS NOT NULL GROUP BY 1, 2),
          |t AS (SELECT from_type, sum(n) AS tot FROM c GROUP BY 1)
          |SELECT c.from_type, c.to_type, CAST(c.n AS BIGINT) AS n,
          |       CAST(c.n * 1000000 // greatest(t.tot, 1) AS BIGINT)
          |         AS share_micro
          |FROM c JOIN t ON c.from_type = t.from_type
          |ORDER BY c.from_type, c.to_type""".stripMargin)),

    // ── Incremental transition matrix (q151's log-ingest shape): three
    //    time-partitioned batches fold through the per-user last-event
    //    state; boundary-crossing pairs stitch through it, deltas merge
    //    by pure addition, and the result must equal the full-corpus
    //    matrix EXACTLY — q151's oracle reused verbatim. ────────────────
    QueryDef.sorted(
      "q155_transition_incremental",
      (s, dir) => {
        val ev = s.read.parquet(s"$dir/events.parquet")
        // parse ONCE (the q158 shape): three folds, one persisted scan
        val withTs = graft.CacheBarriers.barrier(
          ev.select(col("user_id"), col("event_id"), col("event_type"),
            graft.source.EventLog.tsUsOf(ev).as("__t")))
        val cut1 = 1704931200000000L
        val cut2 = 1705795200000000L
        val (d1, st1) = EventAnalytics.transitionMatrixIncremental(
          withTs.filter(col("__t") < cut1),
          EventAnalytics.emptyTransitionState(s), col("__t"))
        val (d2, st2) = EventAnalytics.transitionMatrixIncremental(
          withTs.filter(col("__t") >= cut1 && col("__t") < cut2), st1,
          col("__t"))
        val (d3, _) = EventAnalytics.transitionMatrixIncremental(
          withTs.filter(col("__t") >= cut2), st2, col("__t"))
        val merged = EventAnalytics.mergeTransitionCounts(
          EventAnalytics.mergeTransitionCounts(d1, d2), d3)
        val totals = merged.groupBy(col("from_type"))
          .agg(sum(col("n")).as("__t"))
        merged.join(broadcast(totals), Seq("from_type"))
          .withColumn("share_micro",
            expr("n * 1000000L DIV greatest(__t, 1L)"))
          .select(col("from_type"), col("to_type"), col("n"),
            col("share_micro"))
      },
      _.orderBy("from_type", "to_type"),
      Some(
        """WITH e AS (
          |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
          |  FROM events
          |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
          |    AND event_type IS NOT NULL),
          |p AS (SELECT event_type AS to_type,
          |             lag(event_type) OVER (PARTITION BY user_id
          |               ORDER BY ts_us, event_id) AS from_type
          |      FROM e),
          |c AS (SELECT from_type, to_type, count(*) AS n FROM p
          |      WHERE from_type IS NOT NULL GROUP BY 1, 2),
          |t AS (SELECT from_type, sum(n) AS tot FROM c GROUP BY 1)
          |SELECT c.from_type, c.to_type, CAST(c.n AS BIGINT) AS n,
          |       CAST(c.n * 1000000 // greatest(t.tot, 1) AS BIGINT)
          |         AS share_micro
          |FROM c JOIN t ON c.from_type = t.from_type
          |ORDER BY c.from_type, c.to_type""".stripMargin)),

    // ── DAU / trailing-7-day WAU with stickiness: the sliding distinct
    //    has no window form, so each (user, day) activity supports its
    //    7 window-end days via a bounded explode — exact counts. ────────
    QueryDef.sorted(
      "q156_active_users",
      (s, dir) => {
        val ev = s.read.parquet(s"$dir/events.parquet")
        EventAnalytics.activeUsers(ev,
          tsUs = graft.source.EventLog.tsUsOf(ev))
      },
      _.orderBy("day"),
      Some(
        """WITH d AS (
          |  SELECT DISTINCT user_id AS u,
          |         epoch_us(ts) // 86400000000 AS day
          |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
          |dau AS (SELECT day, count(*) AS dau FROM d GROUP BY 1),
          |w AS (SELECT DISTINCT u, day + ux AS day
          |      FROM d, (SELECT unnest(range(0, 7)) AS ux) t),
          |wau AS (SELECT day, count(*) AS wau FROM w GROUP BY 1)
          |SELECT CAST(dau.day AS BIGINT) AS day,
          |       CAST(dau.dau AS BIGINT) AS dau,
          |       CAST(wau.wau AS BIGINT) AS wau,
          |       CAST(dau.dau * 1000000 // greatest(wau.wau, 1) AS BIGINT)
          |         AS stickiness_micro
          |FROM dau JOIN wau ON dau.day = wau.day
          |ORDER BY day""".stripMargin)),

    // ── Incremental DAU/WAU (q156's log-ingest shape): three batches
    //    fold their distinct (user, day) pairs through the order-free
    //    set-union state; each delta re-derives the affected days'
    //    report rows, day-keyed upserts compose them, and the result
    //    must equal the full-log report EXACTLY — q156's oracle reused
    //    verbatim. The batches deliberately fold out of time order:
    //    unlike the session/transition states, set union carries no
    //    time-partitioning contract, and the query exercises that. ──────
    QueryDef.sorted(
      "q158_active_users_incremental",
      (s, dir) => {
        val ev = s.read.parquet(s"$dir/events.parquet")
        // parse ONCE: all three folds slice the same persisted 2-column
        // (user, ts) projection instead of re-scanning + re-parsing the
        // events parquet per fold (the round-11 shape paid the scan ×3)
        val withTs = graft.CacheBarriers.barrier(
          ev.select(col("user_id"),
            graft.source.EventLog.tsUsOf(ev).as("__t")))
        val cut1 = 1704931200000000L
        val cut2 = 1705795200000000L
        val E = EventAnalytics
        // middle slice FIRST — order-freedom is part of the contract
        val (d1, st1) = E.activeUsersIncremental(
          withTs.filter(col("__t") >= cut1 && col("__t") < cut2),
          E.emptyActiveState(s), col("__t"))
        val (d2, st2) = E.activeUsersIncremental(
          withTs.filter(col("__t") < cut1), st1, col("__t"))
        val (d3, _) = E.activeUsersIncremental(
          withTs.filter(col("__t") >= cut2), st2, col("__t"))
        E.mergeActiveReport(E.mergeActiveReport(d1, d2), d3)
      },
      _.orderBy("day"),
      Some(
        """WITH d AS (
          |  SELECT DISTINCT user_id AS u,
          |         epoch_us(ts) // 86400000000 AS day
          |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
          |dau AS (SELECT day, count(*) AS dau FROM d GROUP BY 1),
          |w AS (SELECT DISTINCT u, day + ux AS day
          |      FROM d, (SELECT unnest(range(0, 7)) AS ux) t),
          |wau AS (SELECT day, count(*) AS wau FROM w GROUP BY 1)
          |SELECT CAST(dau.day AS BIGINT) AS day,
          |       CAST(dau.dau AS BIGINT) AS dau,
          |       CAST(wau.wau AS BIGINT) AS wau,
          |       CAST(dau.dau * 1000000 // greatest(wau.wau, 1) AS BIGINT)
          |         AS stickiness_micro
          |FROM dau JOIN wau ON dau.day = wau.day
          |ORDER BY day""".stripMargin)),

    // ── Event path census (the transition matrix generalized to
    //    3-grams): every run of 3 consecutive events in a user's
    //    (ts, tie)-ordered history counts its type sequence — two lags
    //    riding ONE per-user window sort into a ≤|types|³-group count
    //    with exact run shares. ─────────────────────────────────────────
    QueryDef.sorted(
      "q164_path_census",
      (s, dir) => {
        val ev = s.read.parquet(s"$dir/events.parquet")
        EventAnalytics.pathCensus(ev, k = 3,
          tsUs = graft.source.EventLog.tsUsOf(ev))
      },
      _.orderBy("path"),
      Some(
        """WITH e AS (
          |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
          |  FROM events
          |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
          |    AND event_type IS NOT NULL),
          |p AS (SELECT event_type AS t0,
          |             lag(event_type, 1) OVER (PARTITION BY user_id
          |               ORDER BY ts_us, event_id) AS p1,
          |             lag(event_type, 2) OVER (PARTITION BY user_id
          |               ORDER BY ts_us, event_id) AS p2
          |      FROM e),
          |c AS (SELECT p2 || '>' || p1 || '>' || t0 AS path, count(*) AS n
          |      FROM p WHERE p2 IS NOT NULL GROUP BY 1),
          |t AS (SELECT sum(n) AS tot FROM c)
          |SELECT path, CAST(n AS BIGINT) AS n,
          |       CAST(n * 1000000 // greatest(t.tot, 1) AS BIGINT)
          |         AS share_micro
          |FROM c, t ORDER BY path""".stripMargin)),

    // ── Incremental path census (q164's log-ingest shape): three
    //    time-partitioned batches fold through the per-user
    //    last-(k−1)-events tail state; boundary-crossing 3-grams stitch
    //    through it, deltas merge by pure addition, and the result must
    //    equal the full-corpus census EXACTLY — q164's oracle reused
    //    verbatim. ───────────────────────────────────────────────────────
    QueryDef.sorted(
      "q165_path_census_incremental",
      (s, dir) => {
        val ev = s.read.parquet(s"$dir/events.parquet")
        // parse ONCE (the q158 shape): three folds, one persisted scan
        val withTs = graft.CacheBarriers.barrier(
          ev.select(col("user_id"), col("event_id"), col("event_type"),
            graft.source.EventLog.tsUsOf(ev).as("__t")))
        val cut1 = 1704931200000000L
        val cut2 = 1705795200000000L
        val E = EventAnalytics
        val (d1, st1) = E.pathCensusIncremental(
          withTs.filter(col("__t") < cut1),
          E.emptyPathState(s), k = 3, col("__t"))
        val (d2, st2) = E.pathCensusIncremental(
          withTs.filter(col("__t") >= cut1 && col("__t") < cut2), st1,
          k = 3, col("__t"))
        val (d3, _) = E.pathCensusIncremental(
          withTs.filter(col("__t") >= cut2), st2, k = 3, col("__t"))
        E.pathReportFromCounts(E.mergePathCounts(
          E.mergePathCounts(d1, d2), d3))
      },
      _.orderBy("path"),
      Some(
        """WITH e AS (
          |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
          |  FROM events
          |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
          |    AND event_type IS NOT NULL),
          |p AS (SELECT event_type AS t0,
          |             lag(event_type, 1) OVER (PARTITION BY user_id
          |               ORDER BY ts_us, event_id) AS p1,
          |             lag(event_type, 2) OVER (PARTITION BY user_id
          |               ORDER BY ts_us, event_id) AS p2
          |      FROM e),
          |c AS (SELECT p2 || '>' || p1 || '>' || t0 AS path, count(*) AS n
          |      FROM p WHERE p2 IS NOT NULL GROUP BY 1),
          |t AS (SELECT sum(n) AS tot FROM c)
          |SELECT path, CAST(n AS BIGINT) AS n,
          |       CAST(n * 1000000 // greatest(t.tot, 1) AS BIGINT)
          |         AS share_micro
          |FROM c, t ORDER BY path""".stripMargin)),

    // ── Incremental retention triangle (q143's log-ingest shape): the
    //    middle slice folds FIRST, so when the earliest slice arrives
    //    every early user's cohort MOVES retroactively — the signed
    //    delta retracts their old-cohort cells and re-emits the new row
    //    set; cells fold by pure addition and the result must equal the
    //    full-log triangle EXACTLY — q143's oracle reused verbatim. ─────
    QueryDef.sorted(
      "q162_retention_incremental",
      (s, dir) => {
        val ev = s.read.parquet(s"$dir/events.parquet")
        // parse ONCE (the q158 shape): [[EventAnalytics.activityPairs]]
        // reads only (user, ts); three folds, one persisted 2-column scan
        val withTs = graft.CacheBarriers.barrier(
          ev.select(col("user_id"),
            graft.source.EventLog.tsUsOf(ev).as("__t")))
        val cut1 = 1704931200000000L
        val cut2 = 1705795200000000L
        val E = EventAnalytics
        val (d1, st1) = E.retentionCohortsIncremental(
          withTs.filter(col("__t") >= cut1 && col("__t") < cut2),
          E.emptyActiveState(s), col("__t"))
        val (d2, st2) = E.retentionCohortsIncremental(
          withTs.filter(col("__t") < cut1), st1, col("__t"))
        val (d3, _) = E.retentionCohortsIncremental(
          withTs.filter(col("__t") >= cut2), st2, col("__t"))
        E.mergeRetentionCells(E.mergeRetentionCells(d1, d2), d3)
      },
      _.orderBy("cohort_day", "offset_days"),
      Some(
        """WITH d AS (
          |  SELECT DISTINCT user_id AS u,
          |         epoch_us(ts) // 86400000000 AS day
          |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
          |c AS (SELECT u, day,
          |             min(day) OVER (PARTITION BY u) AS cohort_day
          |      FROM d)
          |SELECT CAST(cohort_day AS BIGINT) AS cohort_day,
          |       CAST(day - cohort_day AS BIGINT) AS offset_days,
          |       CAST(count(*) AS BIGINT) AS n_users
          |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ── Tight-window funnel (q142's withinUs arm driven into deep
    //    attrition): a 6-hour conversion window collapses the chain —
    //    at sf0.01 the purchase step reaches ZERO users — so the
    //    zero-previous-step division guards (greatest(n, 1)) and the
    //    empty-step-frame joins get a cross-engine row, which q142's
    //    3-day window (105/79/55 survivors) never exercises. ────────────
    QueryDef.sorted(
      "q160_funnel_tight_window",
      (s, dir) => {
        val ev = s.read.parquet(s"$dir/events.parquet")
        EventAnalytics.funnel(ev,
          Seq("signup", "view", "click", "purchase"),
          tsUs = graft.source.EventLog.tsUsOf(ev),
          withinUs = Some(21600000000L))
      },
      _.orderBy("step_idx"),
      Some {
        val steps = Seq("signup", "view", "click", "purchase")
        val rep = steps.zipWithIndex.map { case (st, i) =>
          val prev = if (i == 0) "fstep_0" else s"fstep_${i - 1}"
          s"SELECT $i AS step_idx, '$st' AS step, " +
            s"(SELECT count(*) FROM fstep_$i) AS n_users, " +
            s"(SELECT count(*) FROM $prev) AS np"
        }.mkString("\n  UNION ALL\n  ")
        s"""WITH ${EventAnalytics.sqlFunnelCtes("events", steps,
            withinUs = Some(21600000000L))},
           |rep AS (
           |  $rep)
           |SELECT CAST(step_idx AS BIGINT) AS step_idx, step,
           |       CAST(n_users AS BIGINT) AS n_users,
           |       CAST(n_users * 1000000 //
           |            greatest((SELECT count(*) FROM fstep_0), 1) AS BIGINT)
           |         AS conv_total_micro,
           |       CAST(n_users * 1000000 // greatest(np, 1) AS BIGINT)
           |         AS conv_step_micro
           |FROM rep ORDER BY step_idx""".stripMargin
      }),

    // ── Incremental funnel (q142's log-ingest shape): three
    //    time-partitioned batches fold through per-user step-completion
    //    state (m_i only ever transitions null → set under strictly
    //    increasing ts, so the fold is exact); the report off the final
    //    state must equal the full-log windowed funnel EXACTLY — q142's
    //    oracle reused verbatim. ────────────────────────────────────────
    QueryDef.sorted(
      "q163_funnel_incremental",
      (s, dir) => {
        val ev = s.read.parquet(s"$dir/events.parquet")
        // parse ONCE (the q158 shape): three folds, one persisted scan
        val withTs = graft.CacheBarriers.barrier(
          ev.select(col("user_id"), col("event_type"),
            graft.source.EventLog.tsUsOf(ev).as("__t")))
        val cut1 = 1704931200000000L
        val cut2 = 1705795200000000L
        val steps = Seq("signup", "view", "click", "purchase")
        val win = Some(3L * 86400000000L)
        val E = EventAnalytics
        val st1 = E.funnelIncremental(withTs.filter(col("__t") < cut1),
          E.emptyFunnelState(s, steps.length), steps, col("__t"), win)
        val st2 = E.funnelIncremental(
          withTs.filter(col("__t") >= cut1 && col("__t") < cut2), st1,
          steps, col("__t"), win)
        val st3 = E.funnelIncremental(withTs.filter(col("__t") >= cut2),
          st2, steps, col("__t"), win)
        E.funnelReportFromState(st3, steps)
      },
      _.orderBy("step_idx"),
      Some {
        val steps = Seq("signup", "view", "click", "purchase")
        val rep = steps.zipWithIndex.map { case (st, i) =>
          val prev = if (i == 0) "fstep_0" else s"fstep_${i - 1}"
          s"SELECT $i AS step_idx, '$st' AS step, " +
            s"(SELECT count(*) FROM fstep_$i) AS n_users, " +
            s"(SELECT count(*) FROM $prev) AS np"
        }.mkString("\n  UNION ALL\n  ")
        s"""WITH ${EventAnalytics.sqlFunnelCtes("events", steps,
            withinUs = Some(3L * 86400000000L))},
           |rep AS (
           |  $rep)
           |SELECT CAST(step_idx AS BIGINT) AS step_idx, step,
           |       CAST(n_users AS BIGINT) AS n_users,
           |       CAST(n_users * 1000000 //
           |            greatest((SELECT count(*) FROM fstep_0), 1) AS BIGINT)
           |         AS conv_total_micro,
           |       CAST(n_users * 1000000 // greatest(np, 1) AS BIGINT)
           |         AS conv_step_micro
           |FROM rep ORDER BY step_idx""".stripMargin
      }),

    // ── In-session funnel (operator composition): sessionize at a 24 h
    //    gap, then run the conversion funnel with the (user, session)
    //    composite as the funnel key — steps must complete INSIDE one
    //    session. Two operators, zero new code paths. ──────────────────
    QueryDef.sorted(
      "q152_session_funnel",
      (s, dir) => {
        val ev = s.read.parquet(s"$dir/events.parquet")
        val sess = Sessionize.withSessions(ev, gapUs = 86400000000L,
            tsUs = graft.source.EventLog.tsUsOf(ev))
          .withColumn("usess",
            concat_ws("#", col("user_id"), col("session_seq")))
        EventAnalytics.funnel(sess, Seq("view", "click", "purchase"),
            tsUs = col("ts_us"), userCol = "usess")
          .withColumnRenamed("n_users", "n_sessions")
      },
      _.orderBy("step_idx"),
      Some {
        val steps = Seq("view", "click", "purchase")
        val rep = steps.zipWithIndex.map { case (st, i) =>
          val prev = if (i == 0) "fstep_0" else s"fstep_${i - 1}"
          s"SELECT $i AS step_idx, '$st' AS step, " +
            s"(SELECT count(*) FROM fstep_$i) AS n_sessions, " +
            s"(SELECT count(*) FROM $prev) AS np"
        }.mkString("\n  UNION ALL\n  ")
        val chain = steps.zipWithIndex.tail.map { case (st, i) =>
          s"""fstep_$i AS (
             |  SELECT e.u, min(e.ts_us) AS t
             |  FROM sev e JOIN fstep_${i - 1} p ON e.u = p.u
             |  WHERE e.ty = '$st' AND e.ts_us >= p.t GROUP BY e.u)"""
            .stripMargin
        }.mkString(",\n")
        s"""WITH ${Sessionize.sqlSessionCtes("events", 86400000000L)},
           |sev AS (
           |  SELECT CAST(user_id AS VARCHAR) || '#' ||
           |           CAST(session_seq AS VARCHAR) AS u,
           |         event_type AS ty, ts_us
           |  FROM sess_s),
           |fstep_0 AS (SELECT u, min(ts_us) AS t FROM sev
           |            WHERE ty = 'view' GROUP BY u),
           |$chain,
           |rep AS (
           |  $rep)
           |SELECT CAST(step_idx AS BIGINT) AS step_idx, step,
           |       CAST(n_sessions AS BIGINT) AS n_sessions,
           |       CAST(n_sessions * 1000000 //
           |            greatest((SELECT count(*) FROM fstep_0), 1) AS BIGINT)
           |         AS conv_total_micro,
           |       CAST(n_sessions * 1000000 // greatest(np, 1) AS BIGINT)
           |         AS conv_step_micro
           |FROM rep ORDER BY step_idx""".stripMargin
      }),

    // ── Step-latency quantiles (q185): HOW LONG each funnel transition
    //    takes, not just whether it converts — per adjacent pair, the
    //    per-user seconds from the FIRST upstream event to the first
    //    downstream event at-or-after it, distributed through the
    //    mergeable quantile census (q173) with the exact census-selected
    //    quantile next to the estimate. The product-analytics companion
    //    the conversion funnel (q142) can't answer: a step can convert
    //    at 90% and still be the pipeline's latency problem. Per-pair
    //    work is one groupBy(user) min + one self-join on user (both
    //    user-keyed shuffles); the quantile selection runs over the
    //    config-sized census, never the deltas. All integer: epoch
    //    micros, DIV to seconds, shared-ceiling ranks. ────────────────────
    QueryDef.sorted(
      "q185_funnel_latency",
      (s, dir) => {
        val pcts = Seq(50, 90, 99)
        val pairsDef = Seq(("signup", "view"), ("view", "click"),
          ("click", "purchase"))
        val ev = s.read.parquet(s"$dir/events.parquet")
        val typed = graft.CacheBarriers.barrier(
          ev.select(col("user_id"), EventLog.tsUsOf(ev).as("ts_us"),
            col("event_type")))
        val deltas = graft.CacheBarriers.barrier(pairsDef.map {
          case (a, b) =>
            val ta = typed.filter(col("event_type") === a)
              .groupBy(col("user_id")).agg(min(col("ts_us")).as("ta"))
            typed.filter(col("event_type") === b)
              .join(ta, Seq("user_id"))
              .filter(col("ts_us") >= col("ta"))
              .groupBy(col("user_id"), col("ta"))
              .agg(min(col("ts_us")).as("tb"))
              .select(lit(s"${a}->${b}").as("pair"),
                expr("(tb - ta) DIV 1000000L").as("delta_s"))
        }.reduce(_ unionByName _))
        val est = QuantileSketch.estimates(
          QuantileSketch.census(deltas, col("delta_s"), Seq("pair")),
          Seq("pair"), pcts)
        val exact = QuantileSketch.exactQuantiles(deltas, col("delta_s"),
          Seq("pair"), pcts)
        val n = deltas.groupBy(col("pair")).agg(count(lit(1)).as("n_users"))
        est.join(exact, Seq("pair", "pct"))
          .join(n, Seq("pair"))
          .select(col("pair"), col("pct").cast("long"), col("n_users"),
            col("est"), col("exact"))
      },
      _.orderBy("pair", "pct"),
      Some(funnelLatencySql)),

    // ── Incremental step latency (q188): the same report folded one
    //    time-partitioned batch at a time — each pair IS a 2-step
    //    funnel, so its per-user (m_0, m_1) completion state is exactly
    //    [[EventAnalytics.funnelIncremental]]'s (the chain rule "first
    //    downstream at-or-after first upstream" is the pair latency
    //    definition). ALL pairs fold in ONE funnelIncremental per batch:
    //    the state key is the (user, pair) struct and each step-typed
    //    event explodes to its (pair, role∈{a,b}) memberships, so every
    //    batch is scanned once instead of once per pair (the round-12
    //    shape paid 3 pairs × 3 batches = 9 sequential folds) — the fold
    //    code itself is untouched, the strictly-increasing-ts raise and
    //    the null→set exactness argument riding on the composite key
    //    exactly as on a plain user. Oracle = q185's full-log SQL
    //    VERBATIM (the incremental ≡ full identity, the q141/q155/q163
    //    discipline). ─────────────────────────────────────────────────
    QueryDef.sorted(
      "q188_funnel_latency_incremental",
      (s, dir) => {
        val pcts = Seq(50, 90, 99)
        val pairsDef = Seq(("signup", "view"), ("view", "click"),
          ("click", "purchase"))
        val ev = s.read.parquet(s"$dir/events.parquet")
        val withTs = ev.withColumn("__t", EventLog.tsUsOf(ev))
        val cut1 = 1704931200000000L
        val cut2 = 1705795200000000L
        val E = EventAnalytics
        // event type -> the (pair, role) memberships it participates in;
        // "view" belongs to two pairs, so it explodes to two role rows
        val membership: Seq[(String, Seq[(String, String)])] = pairsDef
          .flatMap { case (a, b) =>
            val lbl = s"$a->$b"; Seq(a -> (lbl, "a"), b -> (lbl, "b"))
          }.groupBy(_._1).view.mapValues(_.map(_._2)).toSeq
        val types = membership.map(_._1)
        val roleArr = membership.map { case (t, ms) =>
          (t, array(ms.map { case (lbl, role) =>
            struct(lit(lbl).as("pair"), lit(role).as("role"))
          }: _*))
        }
        val arrExpr = roleArr.tail.foldLeft(
          when(col("event_type") === roleArr.head._1, roleArr.head._2)) {
          case (acc, (t, a)) => acc.when(col("event_type") === t, a)
        }
        val roles = graft.CacheBarriers.barrier(withTs
          .filter(col("event_type").isin(types: _*))
          .withColumn("__pr", explode(arrExpr))
          .select(struct(col("user_id").as("u"),
            col("__pr.pair").as("pair")).as("user_id"),
            col("__pr.role").as("event_type"), col("__t")))
        val st0 = E.emptyFunnelState(s, 2, org.apache.spark.sql.types
          .StructType(Seq(
            org.apache.spark.sql.types.StructField("u",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("pair",
              org.apache.spark.sql.types.StringType))))
        val st3 = Seq(
          roles.filter(col("__t") < cut1),
          roles.filter(col("__t") >= cut1 && col("__t") < cut2),
          roles.filter(col("__t") >= cut2))
          .foldLeft(st0)((st, b) =>
            E.funnelIncremental(b, st, Seq("a", "b"), col("__t")))
        val deltas = graft.CacheBarriers.barrier(
          st3.filter(col("m_1").isNotNull)
            .select(col("__u.pair").as("pair"),
              expr("(m_1 - m_0) DIV 1000000L").as("delta_s")))
        val est = QuantileSketch.estimates(
          QuantileSketch.census(deltas, col("delta_s"), Seq("pair")),
          Seq("pair"), pcts)
        val exact = QuantileSketch.exactQuantiles(deltas, col("delta_s"),
          Seq("pair"), pcts)
        val n = deltas.groupBy(col("pair")).agg(count(lit(1)).as("n_users"))
        est.join(exact, Seq("pair", "pct"))
          .join(n, Seq("pair"))
          .select(col("pair"), col("pct").cast("long"), col("n_users"),
            col("est"), col("exact"))
      },
      _.orderBy("pair", "pct"),
      Some(funnelLatencySql)),

    // ── Rejects quarantine census (q197): the errors channel the
    //    reference keeps visible — every doc op with an unkeyable id is
    //    skipped WITH a log line (monstache.go:3167-3171), never
    //    silently. The fixture corrupts ids in-query by event_id
    //    arithmetic (empty at %97, 600-char pad at %101 — over the
    //    512-BYTE sink key cap); [[Routing.withMeta]] in quarantine mode
    //    tags instead of filtering, and the census counts ops by reason.
    //    Drop ops are exempt by contract (they carry no id; the n_drop
    //    column proves they all land in `accepted`). Pure column algebra
    //    → one shuffle for the 3-row census. ───────────────────────────
    QueryDef.sorted(
      "q197_reject_census",
      (s, dir) => {
        val fixture = EventLog.envelopeWithDrops(s, dir).withColumn("id",
          when(col("event_id") % 97 === 0, lit(""))
            .when(col("event_id") % 101 === 0, rpad(col("id"), 600, "x"))
            .otherwise(col("id")))
        Routing.withMeta(fixture, quarantine = true)
          .groupBy(coalesce(col(Quarantine.ReasonCol), lit("accepted"))
            .as("reason"))
          .agg(count(lit(1)).as("n"),
            count(when(col("operation").isin("drop_coll", "drop_db"),
              lit(1))).as("n_drop"))
      },
      _.orderBy("reason"),
      Some(
        s"""WITH ${EventLog.oracleCteWithDrops}
          |, fixture AS (
          |  SELECT *, CASE WHEN event_id % 97 = 0 THEN ''
          |                 WHEN event_id % 101 = 0 THEN rpad(id, 600, 'x')
          |                 ELSE id END AS fid
          |  FROM envd),
          |tagged AS (
          |  SELECT *, CASE
          |      WHEN operation IN ('drop_coll','drop_db') THEN NULL
          |      WHEN fid IS NULL OR length(fid) = 0 THEN 'empty_id'
          |      WHEN octet_length(encode(fid)) > 512 THEN 'oversized_id'
          |      ELSE NULL END AS reject_reason
          |  FROM fixture)
          |SELECT coalesce(reject_reason, 'accepted') AS reason,
          |       count(*) AS n,
          |       count(CASE WHEN operation IN ('drop_coll','drop_db')
          |                  THEN 1 END) AS n_drop
          |FROM tagged GROUP BY 1 ORDER BY reason""".stripMargin)),

    // ── Point-in-time (as-of) join (q201): every purchase picks up the
    //    user's most recent at-or-before view within 24h — the no-future-
    //    leakage feature-attachment join. NOT a join under the hood: both
    //    sides union, shuffle ONCE on the user key, sort once, and a
    //    single running last(payload) window hands each purchase its
    //    match (the naive r.ts <= l.ts join explodes quadratically on hot
    //    keys). The oracle replays the argmax per row via LATERAL — the
    //    semantics, not the plan. ──────────────────────────────────────
    QueryDef.sorted(
      "q201_asof_join",
      (s, dir) => asofViewsBeforePurchases(
        s.read.parquet(s"$dir/events.parquet")),
      _.orderBy("event_id"),
      Some(asofOracleSql)),

    // ── Incremental as-of (q202): the month of events folds in three
    //    time-partitioned batches; the carried state is ONE right row per
    //    user (the latest view), so matching new purchases never re-reads
    //    history. Output ∪ over batches must equal the full-corpus as-of
    //    EXACTLY — q201's oracle verbatim; the hash match IS the fold
    //    identity. ──────────────────────────────────────────────────────
    QueryDef.sorted(
      "q202_asof_incremental",
      (s, dir) => {
        val ev = s.read.parquet(s"$dir/events.parquet")
        val base = ev.withColumn("__t", EventLog.tsUsOf(ev))
        // parse ONCE (the q158 shape): each side is sliced three times
        // below — 6 parquet scans before; 2 persisted projections now
        val lefts = graft.CacheBarriers.barrier(
          base.filter(col("event_type") === "purchase")
            .select(col("event_id"), col("user_id"), col("__t")))
        val rights = graft.CacheBarriers.barrier(
          base.filter(col("event_type") === "view")
            .select(col("user_id"), col("event_id").as("v_event_id"),
              col("value").as("v_value"), col("__t")))
        val cut1 = 1704931200000000L // 2024-01-11T00:00:00Z
        val cut2 = 1705795200000000L // 2024-01-21T00:00:00Z
        // NULL-ts lefts ride the first batch (a cut predicate can place
        // them nowhere else); they match nothing, as in the full run
        val lCuts = Seq(
          lefts.filter(col("__t").isNull || col("__t") < cut1),
          lefts.filter(col("__t") >= cut1 && col("__t") < cut2),
          lefts.filter(col("__t") >= cut2))
        val rCuts = Seq(
          rights.filter(col("__t") < cut1),
          rights.filter(col("__t") >= cut1 && col("__t") < cut2),
          rights.filter(col("__t") >= cut2))
        val outs = lCuts.zip(rCuts)
          .foldLeft((Seq.empty[org.apache.spark.sql.DataFrame],
            AsofJoin.emptyState(rights))) { case ((acc, st), (lb, rb)) =>
            val (o, st2) = AsofJoin.asofBackwardIncremental(lb, rb, st,
              Seq("user_id"), col("__t"), col("__t"), "v_event_id",
              toleranceUs = Some(86400000000L))
            (acc :+ o, st2)
          }._1
        outs.reduce(_ unionByName _)
          .select(col("event_id"), col("user_id").cast("long"),
            col("ts_us"), col("asof_v_event_id").as("v_event_id"),
            col("asof_ts_us").as("v_ts_us"),
            (col("ts_us") - col("asof_ts_us")).as("lag_us"),
            col("asof_v_value").as("v_value"))
      },
      _.orderBy("event_id"),
      Some(asofOracleSql)),

    // ── Interval-containment join (q203): every error event attributed
    //    to every session whose ±40-minute grace window covers it —
    //    sessions built from the NON-error events (30-min gap), so a
    //    between-sessions error can match zero, one, or (silence between
    //    30 and 80 minutes) BOTH neighbouring windows. Spark would plan
    //    the raw `ts BETWEEN s AND e` as a nested loop; [[IntervalJoin]]
    //    discretizes both sides onto a 1-hour grid and joins EQUI on
    //    (user, cell) + a residual filter — never quadratic. The oracle
    //    states the containment directly. ──────────────────────────────
    QueryDef.sorted(
      "q203_interval_attribution",
      (s, dir) => {
        val ev = s.read.parquet(s"$dir/events.parquet")
        val tsU = EventLog.tsUsOf(ev)
        val padUs = 2400L * 1000000L
        val sess = Sessionize.sessionStats(
            ev.filter(col("event_type") =!= "error"),
            gapUs = 1800L * 1000000L, tsUs = tsU)
          .select(col("user_id"), col("session_seq"),
            col("start_us"), col("end_us"),
            (col("start_us") - padUs).as("__ps"),
            (col("end_us") + padUs).as("__pe"))
        val errs = ev.filter(col("event_type") === "error")
          .select(col("event_id"), col("user_id"), tsU.as("__t"))
        IntervalJoin.byContainment(errs, sess, Seq("user_id"),
            col("__t"), col("__ps"), col("__pe"),
            binUs = 3600L * 1000000L)
          .select(col("event_id"), col("user_id").cast("long"),
            col("ts_us"), col("iv_session_seq").as("session_seq"),
            col("iv_start_us").as("sess_start_us"),
            col("iv_end_us").as("sess_end_us"))
      },
      _.orderBy("event_id", "session_seq"),
      Some(
        s"""WITH ne AS (SELECT * FROM events WHERE event_type <> 'error'),
           |${Sessionize.sqlSessionCtes("ne", 1800L * 1000000L)},
           |sess AS (
           |  SELECT user_id, session_seq,
           |         min(ts_us) AS start_us, max(ts_us) AS end_us
           |  FROM sess_s GROUP BY 1, 2),
           |err AS (
           |  SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
           |  WHERE event_type = 'error'
           |    AND user_id IS NOT NULL AND ts IS NOT NULL)
           |SELECT p.event_id, CAST(p.user_id AS BIGINT) AS user_id,
           |       p.ts_us, CAST(s.session_seq AS BIGINT) AS session_seq,
           |       CAST(s.start_us AS BIGINT) AS sess_start_us,
           |       CAST(s.end_us AS BIGINT) AS sess_end_us
           |FROM err p JOIN sess s
           |  ON p.user_id = s.user_id
           | AND p.ts_us >= s.start_us - 2400000000
           | AND p.ts_us <= s.end_us + 2400000000
           |ORDER BY p.event_id, s.session_seq""".stripMargin)),

    // ── Rolling event-time features (q204): at every event, the user's
    //    trailing 7-day and 1-day activity (count + integer value sum)
    //    and the gap since their previous event — recency/frequency at
    //    the moment of each example, no future leakage by construction.
    //    All features stack as RANGE windows over ONE user-keyed
    //    exchange and one (user, ts, tie) sort; sums are floored to
    //    BIGINT so the accumulation replays exactly cross-engine. ──────
    QueryDef.sorted(
      "q204_rolling_features",
      (s, dir) => {
        val ev = s.read.parquet(s"$dir/events.parquet")
        EventAnalytics.rollingFeatures(ev,
            tsUs = EventLog.tsUsOf(ev),
            valueCol = floor(col("value")),
            windows = Seq("7d" -> 604800000000L, "1d" -> 86400000000L))
          .select(col("event_id"), col("user_id").cast("long"),
            col("ts_us"), col("n_7d"), col("sum_7d"),
            col("n_1d"), col("sum_1d"), col("prev_gap_us"))
      },
      _.orderBy("event_id"),
      Some(rollingOracleSql)),

    // ── Incremental rolling features (q206): the month of events folds
    //    in three strictly time-partitioned batches; the carried state
    //    is the widest window back from the global tail plus each
    //    user's single latest event (the gap anchor), so features for
    //    new events never re-read history. Output ∪ over batches must
    //    equal q204 EXACTLY — its oracle verbatim; the hash match IS
    //    the fold identity. ─────────────────────────────────────────────
    QueryDef.sorted(
      "q206_rolling_incremental",
      (s, dir) => {
        val ev = s.read.parquet(s"$dir/events.parquet")
        // parse ONCE (the q158 shape): three folds, one persisted scan
        val withTs = graft.CacheBarriers.barrier(
          ev.select(col("user_id"), col("event_id"), col("value"),
            EventLog.tsUsOf(ev).as("__t")))
        val cut1 = 1704931200000000L // 2024-01-11T00:00:00Z
        val cut2 = 1705795200000000L // 2024-01-21T00:00:00Z
        val wins = Seq("7d" -> 604800000000L, "1d" -> 86400000000L)
        val batches = Seq(
          withTs.filter(col("__t") < cut1),
          withTs.filter(col("__t") >= cut1 && col("__t") < cut2),
          withTs.filter(col("__t") >= cut2))
        val outs = batches.foldLeft(
          (Seq.empty[org.apache.spark.sql.DataFrame],
            EventAnalytics.emptyRollingState(s))) { case ((acc, st), b) =>
          val (f, st2) = EventAnalytics.rollingFeaturesIncremental(
            b, st, tsUs = col("__t"), valueCol = floor(col("value")),
            windows = wins)
          (acc :+ f, st2)
        }._1
        outs.reduce(_ unionByName _)
          .select(col("event_id"), col("user_id").cast("long"),
            col("ts_us"), col("n_7d"), col("sum_7d"),
            col("n_1d"), col("sum_1d"), col("prev_gap_us"))
      },
      _.orderBy("event_id"),
      Some(rollingOracleSql)),

    // ── SCD2 interval build (q205): each user's purchase-tier history
    //    (tier = value÷100, floored) compressed into [from, to) validity
    //    intervals — consecutive same-tier purchases collapse, a tier
    //    change closes and reopens, the last interval stays open. The
    //    dimension-versioning table behind point-in-time joins. One key
    //    exchange; an island's start row IS its interval row (no
    //    aggregation pass). ────────────────────────────────────────────
    QueryDef.sorted(
      "q205_scd2_intervals",
      (s, dir) => {
        val ev = s.read.parquet(s"$dir/events.parquet")
        Scd2.intervals(
            ev.filter(col("event_type") === "purchase"),
            Seq("user_id"), EventLog.tsUsOf(ev),
            floor(col("value") / 100).cast("long"), "event_id")
          .select(col("user_id").cast("long"), col("value").as("tier"),
            col("valid_from_us"), col("valid_to_us"))
      },
      _.orderBy("user_id", "valid_from_us"),
      Some(scd2OracleSql)),

    // ── Incremental SCD2 (q209): the tier history folds in three
    //    time-partitioned batches — the carried state row (one per user:
    //    the open interval's opening change event plus the folded-tail
    //    fence) re-enters the same islands algebra ahead of each batch,
    //    so a boundary-straddling same-tier run keeps its ORIGINAL
    //    valid_from. Closed ∪ open must equal q205 EXACTLY — its oracle
    //    verbatim; the hash match IS the fold identity. ────────────────
    QueryDef.sorted(
      "q209_scd2_incremental",
      (s, dir) => {
        val ev = s.read.parquet(s"$dir/events.parquet")
        // parse ONCE (the q158 shape): three folds, one persisted scan
        val purch = graft.CacheBarriers.barrier(
          ev.filter(col("event_type") === "purchase")
            .select(col("user_id"), col("event_id"), col("value"),
              EventLog.tsUsOf(ev).as("__t")))
        val cut1 = 1704931200000000L // 2024-01-11T00:00:00Z
        val cut2 = 1705795200000000L // 2024-01-21T00:00:00Z
        val batches = Seq(
          purch.filter(col("__t") < cut1),
          purch.filter(col("__t") >= cut1 && col("__t") < cut2),
          purch.filter(col("__t") >= cut2))
        val (closed, st) = batches.foldLeft(
          (Seq.empty[org.apache.spark.sql.DataFrame],
            Scd2.emptyState(s))) { case ((acc, st0), b) =>
          val (c, st1) = Scd2.intervalsIncremental(b, st0, Seq("user_id"),
            col("__t"), floor(col("value") / 100).cast("long"), "event_id")
          (acc :+ c, st1)
        }
        closed.reduce(_ unionByName _)
          .unionByName(st.select("user_id", "value", "valid_from_us")
            .withColumn("valid_to_us", lit(null).cast("long")))
          .select(col("user_id").cast("long"), col("value").as("tier"),
            col("valid_from_us"), col("valid_to_us"))
      },
      _.orderBy("user_id", "valid_from_us"),
      Some(scd2OracleSql)),

    // ── Forward as-of (q208): each signup picks up the user's EARLIEST
    //    at-or-after purchase within 7 days — time-to-conversion, the
    //    forward mirror of q201 on the same zero-join union-window plan
    //    (sort order mirrored, ties still to the largest event id).
    //    Unconverted signups survive with a NULL match. ────────────────
    QueryDef.sorted(
      "q208_asof_forward",
      (s, dir) => {
        val ev = s.read.parquet(s"$dir/events.parquet")
        val base = ev.withColumn("__t", EventLog.tsUsOf(ev))
        val lefts = base.filter(col("event_type") === "signup")
          .select(col("event_id"), col("user_id"), col("__t"))
        val rights = base.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("p_event_id"),
            col("value").as("p_value"), col("__t"))
        AsofJoin.asofForward(lefts, rights, Seq("user_id"),
            col("__t"), col("__t"), "p_event_id",
            toleranceUs = Some(7L * 86400000000L))
          .select(col("event_id"), col("user_id").cast("long"),
            col("ts_us"), col("asof_p_event_id").as("p_event_id"),
            col("asof_ts_us").as("p_ts_us"),
            (col("asof_ts_us") - col("ts_us")).as("wait_us"),
            col("asof_p_value").as("p_value"))
      },
      _.orderBy("event_id"),
      Some(
        """WITH l AS (
          |  SELECT event_id, user_id, epoch_us(ts) AS ts_us
          |  FROM events WHERE event_type = 'signup'),
          |r AS (
          |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
          |  FROM events WHERE event_type = 'purchase'
          |    AND user_id IS NOT NULL AND ts IS NOT NULL)
          |SELECT l.event_id, CAST(l.user_id AS BIGINT) AS user_id,
          |       l.ts_us, m.event_id AS p_event_id, m.ts_us AS p_ts_us,
          |       m.ts_us - l.ts_us AS wait_us, m.value AS p_value
          |FROM l LEFT JOIN LATERAL (
          |  SELECT r.event_id, r.ts_us, r.value FROM r
          |  WHERE r.user_id = l.user_id AND r.ts_us >= l.ts_us
          |    AND r.ts_us - l.ts_us <= 604800000000
          |  ORDER BY r.ts_us ASC, r.event_id DESC LIMIT 1) m ON TRUE
          |ORDER BY l.event_id""".stripMargin)),

    // ── Point-in-time training examples (q210): one row per CLICK with
    //    everything a leakage-free click model needs AT that instant —
    //    trailing 7-day activity (rolling features), the user's standing
    //    purchase tier (as-of over purchases), and the freshest view
    //    within 24h (as-of over views). ZERO joins: the feature columns
    //    ride through both as-of passes as left columns, so the whole
    //    assembly is three user-keyed window passes. ────────────────────
    QueryDef.sorted(
      "q210_training_examples",
      (s, dir) => {
        val ev = s.read.parquet(s"$dir/events.parquet")
        val tsU = EventLog.tsUsOf(ev)
        val feats = EventAnalytics.rollingFeatures(ev, tsU,
            floor(col("value")), Seq("7d" -> 604800000000L))
          .filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("n_7d"),
            col("sum_7d"), col("prev_gap_us"), col("ts_us").as("__t"))
        val base = ev.withColumn("__t", tsU)
        val tiers = base.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("pid"),
            floor(col("value") / 100).cast("long").as("ptier"), col("__t"))
        val views = base.filter(col("event_type") === "view")
          .select(col("user_id"), col("event_id").as("vid"),
            col("value").as("vval"), col("__t"))
        val withTier = AsofJoin.asofBackward(feats, tiers, Seq("user_id"),
            col("__t"), col("__t"), "pid", prefix = "t_")
          .drop("ts_us", "t___t", "t_pid")
        val out = AsofJoin.asofBackward(withTier, views, Seq("user_id"),
          col("__t"), col("__t"), "vid",
          toleranceUs = Some(86400000000L), prefix = "v_")
        out.select(col("event_id"), col("user_id").cast("long"),
          col("ts_us"), col("n_7d"), col("sum_7d"), col("prev_gap_us"),
          col("t_ptier").as("tier"), col("v_vid").as("view_event_id"),
          (col("ts_us") - col("v_ts_us")).as("view_age_us"),
          col("v_vval").as("view_value"))
      },
      _.orderBy("event_id"),
      Some(
        """WITH e AS (
          |  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
          |         CAST(floor(value) AS BIGINT) AS v, value
          |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
          |f AS (
          |  SELECT event_id, user_id, ts_us,
          |         count(*) OVER w7 AS n_7d,
          |         CAST(sum(v) OVER w7 AS BIGINT) AS sum_7d,
          |         ts_us - lag(ts_us) OVER (PARTITION BY user_id
          |           ORDER BY ts_us, event_id) AS prev_gap_us,
          |         event_type
          |  FROM e
          |  WINDOW w7 AS (PARTITION BY user_id ORDER BY ts_us
          |    RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)),
          |c AS (SELECT * FROM f WHERE event_type = 'click'),
          |p AS (SELECT event_id, user_id, ts_us,
          |             CAST(floor(value / 100) AS BIGINT) AS ptier
          |      FROM e WHERE event_type = 'purchase'),
          |vw AS (SELECT event_id, user_id, ts_us, value FROM e
          |       WHERE event_type = 'view')
          |SELECT c.event_id, CAST(c.user_id AS BIGINT) AS user_id,
          |       c.ts_us, c.n_7d, c.sum_7d, c.prev_gap_us,
          |       tp.ptier AS tier, mv.event_id AS view_event_id,
          |       c.ts_us - mv.ts_us AS view_age_us,
          |       mv.value AS view_value
          |FROM c
          |LEFT JOIN LATERAL (
          |  SELECT p.ptier FROM p
          |  WHERE p.user_id = c.user_id AND p.ts_us <= c.ts_us
          |  ORDER BY p.ts_us DESC, p.event_id DESC LIMIT 1) tp ON TRUE
          |LEFT JOIN LATERAL (
          |  SELECT vw.event_id, vw.ts_us, vw.value FROM vw
          |  WHERE vw.user_id = c.user_id AND vw.ts_us <= c.ts_us
          |    AND c.ts_us - vw.ts_us <= 86400000000
          |  ORDER BY vw.ts_us DESC, vw.event_id DESC LIMIT 1) mv ON TRUE
          |ORDER BY c.event_id""".stripMargin)),

    // ── Temporal per-user holdout (q211): each user's LAST 3 events are
    //    `test`, the rest `train` — the leave-last-k-out eval split that
    //    keeps evaluation strictly in each user's future (a random split
    //    leaks future interactions into training). One user-keyed
    //    exchange and sort. ────────────────────────────────────────────
    QueryDef.sorted(
      "q211_temporal_holdout",
      (s, dir) => {
        val ev = s.read.parquet(s"$dir/events.parquet")
        EventAnalytics.temporalHoldout(ev, k = 3,
            tsUs = EventLog.tsUsOf(ev))
          .select(col("event_id"), col("user_id").cast("long"),
            col("ts_us"), col("split"))
      },
      _.orderBy("event_id"),
      Some(
        """WITH e AS (
          |  SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
          |  WHERE user_id IS NOT NULL AND ts IS NOT NULL),
          |r AS (SELECT *, row_number() OVER (PARTITION BY user_id
          |        ORDER BY ts_us DESC, event_id DESC) AS rn FROM e)
          |SELECT event_id, CAST(user_id AS BIGINT) AS user_id, ts_us,
          |       CASE WHEN rn <= 3 THEN 'test' ELSE 'train' END AS split
          |FROM r ORDER BY event_id""".stripMargin)),

    // ── Session documents (q212): each session rendered as an ordered
    //    event-type sequence string — the event-stream-to-trainable-
    //    sequence assembly an SFT/behavior-model pipeline feeds to the
    //    packing stage. Deterministic inside a session by (ts, tie);
    //    one (user, session)-keyed aggregation over the session sort. ──
    QueryDef.sorted(
      "q212_session_documents",
      (s, dir) => {
        val ev = s.read.parquet(s"$dir/events.parquet")
        Sessionize.withSessions(ev, gapUs = 1800L * 1000000L,
            tsUs = EventLog.tsUsOf(ev))
          .groupBy(col("user_id").cast("long").as("user_id"),
            col("session_seq"))
          .agg(
            array_join(transform(
              array_sort(collect_list(struct(col("ts_us"),
                col("event_id"), col("event_type")))),
              x => x.getField("event_type")), ">").as("doc"),
            count(lit(1)).as("n_events"),
            (max(col("ts_us")) - min(col("ts_us"))).as("dur_us"))
      },
      _.orderBy("user_id", "session_seq"),
      Some(
        s"""WITH ${Sessionize.sqlSessionCtes("events", 1800L * 1000000L)}
           |SELECT CAST(user_id AS BIGINT) AS user_id,
           |       CAST(session_seq AS BIGINT) AS session_seq,
           |       string_agg(event_type, '>'
           |         ORDER BY ts_us, event_id) AS doc,
           |       count(*) AS n_events,
           |       CAST(max(ts_us) - min(ts_us) AS BIGINT) AS dur_us
           |FROM sess_s GROUP BY 1, 2
           |ORDER BY user_id, session_seq""".stripMargin)),

    // ── Skip-gram pair mining (q213): word2vec/item2vec training pairs
    //    from sessionized sequences — every (earlier, later) event-type
    //    pair within 3 positions inside a session, counted by distance.
    //    NOT a self-join: each distance is a lead() frame and all three
    //    stack on ONE session sort (the join formulation shuffles the
    //    corpus twice and explodes on hot sessions). ────────────────────
    QueryDef.sorted(
      "q213_skipgram_pairs",
      (s, dir) => {
        val ev = s.read.parquet(s"$dir/events.parquet")
        EventAnalytics.skipgramPairs(ev, gapUs = 1800L * 1000000L,
          maxDist = 3, tsUs = EventLog.tsUsOf(ev))
      },
      _.orderBy("a", "b", "dist"),
      Some(
        s"""WITH ne AS (SELECT * FROM events WHERE event_type IS NOT NULL),
           |${Sessionize.sqlSessionCtes("ne", 1800L * 1000000L)},
           |l AS (
           |  SELECT event_type,
           |         lead(event_type, 1) OVER w AS l1,
           |         lead(event_type, 2) OVER w AS l2,
           |         lead(event_type, 3) OVER w AS l3
           |  FROM sess_s
           |  WINDOW w AS (PARTITION BY user_id, session_seq
           |               ORDER BY ts_us, event_id)),
           |u AS (
           |  SELECT event_type AS a, l1 AS b, 1 AS dist FROM l
           |  WHERE l1 IS NOT NULL
           |  UNION ALL
           |  SELECT event_type, l2, 2 FROM l WHERE l2 IS NOT NULL
           |  UNION ALL
           |  SELECT event_type, l3, 3 FROM l WHERE l3 IS NOT NULL)
           |SELECT a, b, CAST(dist AS INTEGER) AS dist,
           |       count(*) AS n
           |FROM u GROUP BY 1, 2, 3 ORDER BY a, b, dist""".stripMargin)),

    // ── Distance-conditioned transition probabilities (q214): q213's
    //    pair census normalized per (source type, distance) — P(b | a,
    //    d) as exact integer micro-fractions (no float division
    //    anywhere), the Markov-ish transition table a sequence model's
    //    data card reports. The normalizing window partitions by (a,
    //    dist) — vocabulary-sized frames, never corpus-sized. ──────────
    QueryDef.sorted(
      "q214_transition_probs",
      (s, dir) => {
        val ev = s.read.parquet(s"$dir/events.parquet")
        val counts = EventAnalytics.skipgramPairs(ev,
          gapUs = 1800L * 1000000L, maxDist = 3,
          tsUs = EventLog.tsUsOf(ev))
        counts
          .withColumn("__tot", sum(col("n")).over(
            Window.partitionBy(col("a"), col("dist"))))
          .withColumn("p_micro", expr("n * 1000000L DIV __tot"))
          .select("a", "b", "dist", "n", "p_micro")
      },
      _.orderBy("a", "b", "dist"),
      Some(
        s"""WITH ne AS (SELECT * FROM events WHERE event_type IS NOT NULL),
           |${Sessionize.sqlSessionCtes("ne", 1800L * 1000000L)},
           |l AS (
           |  SELECT event_type,
           |         lead(event_type, 1) OVER w AS l1,
           |         lead(event_type, 2) OVER w AS l2,
           |         lead(event_type, 3) OVER w AS l3
           |  FROM sess_s
           |  WINDOW w AS (PARTITION BY user_id, session_seq
           |               ORDER BY ts_us, event_id)),
           |u AS (
           |  SELECT event_type AS a, l1 AS b, 1 AS dist FROM l
           |  WHERE l1 IS NOT NULL
           |  UNION ALL
           |  SELECT event_type, l2, 2 FROM l WHERE l2 IS NOT NULL
           |  UNION ALL
           |  SELECT event_type, l3, 3 FROM l WHERE l3 IS NOT NULL),
           |c AS (SELECT a, b, CAST(dist AS INTEGER) AS dist,
           |             count(*) AS n
           |      FROM u GROUP BY 1, 2, 3)
           |SELECT a, b, dist, n,
           |       CAST(n * 1000000 //
           |            sum(n) OVER (PARTITION BY a, dist) AS BIGINT)
           |         AS p_micro
           |FROM c ORDER BY a, b, dist""".stripMargin))
  )

  /** q201's plan, shared with the q202 fold identity: purchases as-of
    * backward against views on the user key, 24h tolerance. */
  private def asofViewsBeforePurchases(
      ev: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val base = ev.withColumn("__t", EventLog.tsUsOf(ev))
    val lefts = base.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("__t"))
    val rights = base.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("v_event_id"),
        col("value").as("v_value"), col("__t"))
    AsofJoin.asofBackward(lefts, rights, Seq("user_id"),
        col("__t"), col("__t"), "v_event_id",
        toleranceUs = Some(86400000000L))
      .select(col("event_id"), col("user_id").cast("long"), col("ts_us"),
        col("asof_v_event_id").as("v_event_id"),
        col("asof_ts_us").as("v_ts_us"),
        (col("ts_us") - col("asof_ts_us")).as("lag_us"),
        col("asof_v_value").as("v_value"))
  }

  /** The full-corpus SCD2 SQL — shared by q205 and q209 (the fold
    * identity). */
  private def scd2OracleSql: String =
    """WITH c AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
      |         CAST(floor(value / 100) AS BIGINT) AS tier
      |  FROM events WHERE event_type = 'purchase'
      |    AND user_id IS NOT NULL AND ts IS NOT NULL),
      |l AS (SELECT *, lag(ts_us) OVER w AS pts, lag(tier) OVER w AS ptier
      |      FROM c
      |      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      |s AS (SELECT * FROM l WHERE pts IS NULL
      |                         OR tier IS DISTINCT FROM ptier)
      |SELECT CAST(user_id AS BIGINT) AS user_id, tier,
      |       ts_us AS valid_from_us,
      |       lead(ts_us) OVER (PARTITION BY user_id
      |         ORDER BY ts_us, event_id) AS valid_to_us
      |FROM s ORDER BY user_id, valid_from_us""".stripMargin

  /** The full-corpus rolling-feature SQL — shared by q204 and q206 (the
    * fold identity). */
  private def rollingOracleSql: String =
    """WITH e AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS ts_us,
      |         CAST(floor(value) AS BIGINT) AS v
      |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL)
      |SELECT event_id, CAST(user_id AS BIGINT) AS user_id, ts_us,
      |       count(*) OVER w7 AS n_7d,
      |       CAST(sum(v) OVER w7 AS BIGINT) AS sum_7d,
      |       count(*) OVER w1 AS n_1d,
      |       CAST(sum(v) OVER w1 AS BIGINT) AS sum_1d,
      |       ts_us - lag(ts_us) OVER (PARTITION BY user_id
      |         ORDER BY ts_us, event_id) AS prev_gap_us
      |FROM e
      |WINDOW w7 AS (PARTITION BY user_id ORDER BY ts_us
      |         RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW),
      |       w1 AS (PARTITION BY user_id ORDER BY ts_us
      |         RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  /** The as-of semantics in SQL — per-left argmax via LATERAL with the
    * same (ts, tie) resolution; shared by q201 and q202 (fold identity). */
  private def asofOracleSql: String =
    """WITH l AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS ts_us
      |  FROM events WHERE event_type = 'purchase'),
      |r AS (
      |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
      |  FROM events WHERE event_type = 'view'
      |    AND user_id IS NOT NULL AND ts IS NOT NULL)
      |SELECT l.event_id, CAST(l.user_id AS BIGINT) AS user_id, l.ts_us,
      |       m.event_id AS v_event_id, m.ts_us AS v_ts_us,
      |       l.ts_us - m.ts_us AS lag_us, m.value AS v_value
      |FROM l LEFT JOIN LATERAL (
      |  SELECT r.event_id, r.ts_us, r.value FROM r
      |  WHERE r.user_id = l.user_id AND r.ts_us <= l.ts_us
      |    AND l.ts_us - r.ts_us <= 86400000000
      |  ORDER BY r.ts_us DESC, r.event_id DESC LIMIT 1) m ON TRUE
      |ORDER BY l.event_id""".stripMargin

  /** Shared oracle for q185/q188: the FULL-LOG step-latency quantiles —
    * q188's incremental folds must reproduce it exactly. */
  private def funnelLatencySql: String = {
    val pcts = Seq(50, 90, 99)
    val pairsDef = Seq(("signup", "view"), ("view", "click"),
      ("click", "purchase"))
    val armSql = pairsDef.map { case (a, b) =>
      s"""SELECT '${a}->${b}' AS grp,
         |       (min(e.ts_us) - t.ta) // 1000000 AS x
         |FROM (SELECT user_id, min(ts_us) AS ta FROM e
         |      WHERE event_type = '$a' GROUP BY 1) t
         |JOIN e ON e.user_id = t.user_id AND e.event_type = '$b'
         |      AND e.ts_us >= t.ta
         |GROUP BY e.user_id, t.ta""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_type
       |           FROM events),
       |v AS (
       |$armSql),
       |${QuantileSketch.sqlEstimateCtes("v", pcts)},
       |${QuantileSketch.sqlExactCtes("v", pcts)},
       |cnt AS (SELECT grp, count(*) AS n_users FROM v GROUP BY 1)
       |SELECT e.grp AS pair, CAST(e.pct AS BIGINT) AS pct,
       |       CAST(c.n_users AS BIGINT) AS n_users, e.est, x.exact
       |FROM qsest e
       |JOIN qeex x ON e.grp = x.grp AND e.pct = x.pct
       |JOIN cnt c ON c.grp = e.grp
       |ORDER BY pair, pct""".stripMargin
  }
}
