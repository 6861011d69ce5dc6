package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.config.{ConfiguredPipeline, GraftConfig}
import graft.operators._
import graft.sink.{InMemorySinkBackend, SinkWriter}
import graft.source.EventLog

/** Relate fan-out / lookup queries (SURVEY §2.4 J1-J6, §2.5 A2). The TPC-H
  * FK chain lineitem→orders→customer→nation→region is exactly a reference
  * relate chain (src-field/match-field per hop, FIXTURES.md §4). */
object RelateQueries extends QueryFamily {

  val queries: Seq[QueryDef] = Seq(

    // ── J1: one relate hop (change in orders → fan out to customer) ──────
    QueryDef.sorted(
      "q20_relate_1hop",
      (s, dir) => {
        val changed = s.read.parquet(s"$dir/orders.parquet")
          .filter(col("o_orderkey") % 7 === 0)
        val customer = s.read.parquet(s"$dir/customer.parquet")
        Relate.hopPairs(changed, customer,
            Relation("app.orders", "app.customer", "o_custkey", "c_custkey"))
          .select(col("o_orderkey"), col("c_custkey"), col("c_name"),
            col("c_mktsegment"))
          .distinct()
      },
      _.orderBy("o_orderkey", "c_custkey"),
      Some(
        """SELECT DISTINCT o_orderkey, c_custkey, c_name, c_mktsegment
          |FROM orders JOIN customer ON o_custkey = c_custkey
          |WHERE o_orderkey % 7 = 0
          |ORDER BY o_orderkey, c_custkey""".stripMargin)),

    // ── J1 recursive: 4-hop relate chain, depth-bounded ──────────────────
    QueryDef.sorted(
      "q21_relate_chain",
      (s, dir) => {
        val li = s.read.parquet(s"$dir/lineitem.parquet")
          .filter(col("l_orderkey") % 13 === 0)
        val o = s.read.parquet(s"$dir/orders.parquet")
        val c = s.read.parquet(s"$dir/customer.parquet")
        val n = s.read.parquet(s"$dir/nation.parquet")
        val r = s.read.parquet(s"$dir/region.parquet")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .select(col("l_orderkey"), col("l_linenumber"), col("c_custkey"),
            col("n_name"), col("r_name"))
      },
      _.orderBy("l_orderkey", "l_linenumber", "c_custkey"),
      Some(
        """SELECT l_orderkey, l_linenumber, c_custkey, n_name, r_name
          |FROM lineitem
          |JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |JOIN nation ON c_nationkey = n_nationkey
          |JOIN region ON n_regionkey = r_regionkey
          |WHERE l_orderkey % 13 = 0
          |ORDER BY l_orderkey, l_linenumber, c_custkey""".stripMargin)),

    // ── J2: identity-relation delete propagation (semi-join) ─────────────
    QueryDef.sorted(
      "q22_relate_delete",
      (s, dir) => {
        val deleted = s.read.parquet(s"$dir/orders.parquet")
          .filter(col("o_orderkey") % 10 === 0)
          .select(col("o_orderkey").as("src_key"))
        val li = s.read.parquet(s"$dir/lineitem.parquet")
        Relate.propagateDeletes(deleted, li, "src_key", "l_orderkey")
          .select(col("l_orderkey"), col("l_linenumber"),
            lit("d").as("operation"))
      },
      _.orderBy("l_orderkey", "l_linenumber"),
      Some(
        """SELECT l_orderkey, l_linenumber, 'd' AS operation
          |FROM lineitem
          |WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderkey % 10 = 0)
          |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // ── J3: keep-src routing (join-only namespace drops the source doc) ──
    QueryDef.sorted(
      "q23_keep_src",
      (s, dir) => {
        val changed = s.read.parquet(s"$dir/orders.parquet")
          .filter(col("o_orderkey") % 11 === 0)
        val customer = s.read.parquet(s"$dir/customer.parquet")
        // keep_src=false: only the related side is emitted (monstache.go:3419-3462)
        changed.join(broadcast(customer), col("o_custkey") === col("c_custkey"))
          .select(col("c_custkey").cast("string").as("doc_id"),
            lit("app.customer").as("namespace"))
          .distinct()
          .groupBy("namespace").agg(count(lit(1)).as("n_docs"))
      },
      _.orderBy("namespace"),
      Some(
        """SELECT 'app.customer' AS namespace,
          |       count(DISTINCT c_custkey) AS n_docs
          |FROM orders JOIN customer ON o_custkey = c_custkey
          |WHERE o_orderkey % 11 = 0""".stripMargin)),

    // ── J1: the same chain driven through the generic fanOut operator ────
    // (config-driven BFS with per-relation depth bounds + cycle guard,
    // monstache.go:1221-1358). Each depth's emitted-op count equals the
    // progressive join cardinality, which the oracle computes directly.
    QueryDef.sorted(
      "q26_relate_fanout",
      (s, dir) => {
        val li = s.read.parquet(s"$dir/lineitem.parquet")
          .filter(col("l_orderkey") % 13 === 0)
        // keepSrc on every hop: all depths are indexed, including the
        // depth-0 seeds (without it the intermediate namespaces would be
        // join-only and only region docs would surface)
        val rels = Seq(
          Relation("app.lineitem", "app.orders", "l_orderkey", "o_orderkey",
            keepSrc = true),
          Relation("app.orders", "app.customer", "o_custkey", "c_custkey",
            keepSrc = true, broadcastRelated = true),
          Relation("app.customer", "app.nation", "c_nationkey", "n_nationkey",
            keepSrc = true, broadcastRelated = true),
          Relation("app.nation", "app.region", "n_regionkey", "r_regionkey",
            keepSrc = true, broadcastRelated = true))
        val colls = Map(
          "app.orders" -> s.read.parquet(s"$dir/orders.parquet"),
          "app.customer" -> s.read.parquet(s"$dir/customer.parquet"),
          "app.nation" -> s.read.parquet(s"$dir/nation.parquet"),
          "app.region" -> s.read.parquet(s"$dir/region.parquet"))
        Relate.fanOut(s, Map("app.lineitem" -> li), colls, rels)
          .groupBy("rel_namespace", "rel_depth")
          .agg(count(lit(1)).as("n"))
      },
      _.orderBy("rel_depth", "rel_namespace"),
      Some(
        """WITH seed AS (SELECT * FROM lineitem WHERE l_orderkey % 13 = 0),
          |d1 AS (SELECT o_orderkey, o_custkey FROM seed JOIN orders ON l_orderkey = o_orderkey),
          |d2 AS (SELECT c_custkey, c_nationkey FROM d1 JOIN customer ON o_custkey = c_custkey),
          |d3 AS (SELECT n_nationkey, n_regionkey FROM d2 JOIN nation ON c_nationkey = n_nationkey),
          |d4 AS (SELECT r_regionkey FROM d3 JOIN region ON n_regionkey = r_regionkey)
          |SELECT * FROM (
          |  SELECT 'app.lineitem' AS rel_namespace, 0 AS rel_depth, count(*) AS n FROM seed
          |  UNION ALL SELECT 'app.orders', 1, count(*) FROM d1
          |  UNION ALL SELECT 'app.customer', 2, count(*) FROM d2
          |  UNION ALL SELECT 'app.nation', 3, count(*) FROM d3
          |  UNION ALL SELECT 'app.region', 4, count(*) FROM d4)
          |ORDER BY rel_depth, rel_namespace""".stripMargin)),

    // ── J1 typed: src-field as a dotted path INTO the document with
    // match-field-type coercion (extractData monstache.go:1112-1138,
    // coerceRelateType 1157-1219) — a change's payload field k joins the
    // supplier dimension after string→long coercion. ─────────────────────
    QueryDef.sorted(
      "q52_relate_typed",
      (s, dir) => {
        val changes = EventLog.envelope(s, dir)
          .filter(col("namespace") === "app.t2" && col("document").isNotNull)
        val supplier = s.read.parquet(s"$dir/supplier.parquet")
        Relate.hopPairs(changes, supplier,
            Relation("app.t2", "app.supplier", "document.k", "s_suppkey",
              matchFieldType = Some("long"), broadcastRelated = true))
          .groupBy("s_suppkey", "s_name")
          .agg(count(lit(1)).as("n_ops"))
      },
      _.orderBy("s_suppkey"),
      Some(
        s"""WITH ${EventLog.oracleCte}
           |SELECT s_suppkey, s_name, count(*) AS n_ops
           |FROM envelope e
           |JOIN supplier s
           |  ON CAST(json_extract_string(e.document, '$$.k') AS BIGINT) = s.s_suppkey
           |WHERE e.namespace = 'app.t2' AND e.document IS NOT NULL
           |GROUP BY s_suppkey, s_name
           |ORDER BY s_suppkey""".stripMargin)),

    // ── J1 objectId: match-field-type = objectId hex normalization
    // (convertSrcDataToObjectID monstache.go:1167-1171): src keys arrive
    // as MIXED-CASE hex (and some invalid strings); the coercion
    // lowercases valid 24-hex and nulls the rest, so the join matches the
    // related side's canonical lowercase ids and skips bad keys — the
    // reference's ObjectIDFromHex-or-error behavior. ─────────────────────
    QueryDef.sorted(
      "q57_relate_objectid",
      (s, dir) => {
        val changed = s.read.parquet(s"$dir/orders.parquet")
          .filter(col("o_orderkey") % 13 === 0)
          .withColumn("src_oid",
            when(col("o_orderkey") % 3 === 0, lit("not-a-24-hex-objectid"))
              .otherwise(upper(substring(
                md5(col("o_custkey").cast("string")), 1, 24))))
        val related = s.read.parquet(s"$dir/customer.parquet")
          .withColumn("c_oid",
            substring(md5(col("c_custkey").cast("string")), 1, 24))
        Relate.hopPairs(changed, related,
            Relation("app.orders", "app.customer", "src_oid", "c_oid",
              matchFieldType = Some("objectId"), broadcastRelated = true))
          .groupBy("c_custkey", "c_name")
          .agg(count(lit(1)).as("n_ops"))
      },
      _.orderBy("c_custkey"),
      Some(
        """WITH changed AS (
          |  SELECT o_custkey,
          |         CASE WHEN o_orderkey % 3 = 0 THEN 'not-a-24-hex-objectid'
          |              ELSE upper(substr(md5(CAST(o_custkey AS VARCHAR)), 1, 24)) END AS src_oid
          |  FROM orders WHERE o_orderkey % 13 = 0)
          |SELECT c_custkey, c_name, count(*) AS n_ops
          |FROM changed
          |JOIN customer
          |  ON CASE WHEN regexp_matches(src_oid, '^[0-9A-Fa-f]{24}$')
          |          THEN lower(src_oid) END
          |     = substr(md5(CAST(c_custkey AS VARCHAR)), 1, 24)
          |GROUP BY c_custkey, c_name
          |ORDER BY c_custkey""".stripMargin)),

    // ── J5: find with sort + limit (top-3 updates per doc id) ────────────
    QueryDef.sorted(
      "q24_find_sort_limit",
      (s, dir) => {
        val env = EventLog.envelope(s, dir).filter(col("operation") === "u")
        val w = Window.partitionBy(col("id"))
          .orderBy(col("value").desc, col("event_id").asc)
        env.withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 3)
          .select(col("id"), col("rnk"), col("event_id"), col("value"))
      },
      _.orderBy(col("id").cast("long"), col("rnk")),
      Some(
        s"""WITH ${EventLog.oracleCte},
           |updates AS (SELECT * FROM envelope WHERE operation = 'u'),
           |ranked AS (
           |  SELECT id, event_id, value,
           |         row_number() OVER (PARTITION BY id ORDER BY value DESC, event_id ASC) AS rnk
           |  FROM updates)
           |SELECT id, rnk, event_id, value FROM ranked WHERE rnk <= 3
           |ORDER BY CAST(id AS BIGINT), rnk""".stripMargin)),

    // ── J6/A2: aggregation-pipeline lookup ($match→$group→$sort→$limit) ──
    QueryDef(
      "q25_pipe_agg",
      (s, dir) => {
        EventLog.envelope(s, dir)
          .filter(col("operation") === "u" && col("value") > 50)
          .groupBy("id")
          .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("total"),
            count(lit(1)).as("n"))
          .orderBy(col("total").desc, col("id").cast("long"))
          .limit(100)
      },
      Some(
        s"""WITH ${EventLog.oracleCte}
           |SELECT id,
           |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
           |       count(*) AS n
           |FROM envelope WHERE operation = 'u' AND value > 50
           |GROUP BY id
           |ORDER BY total DESC, CAST(id AS BIGINT)
           |LIMIT 100""".stripMargin)),

    // ── Co-located relate join: both sides stored CLUSTERED BY the match
    //    key (graft.operators.Bucketed), so the customer⋈orders join AND
    //    the per-customer rollup behind it run with ZERO exchanges — the
    //    100 TB layout for the reference's recurring lookup joins, made
    //    literal (BucketedJoinSpec pins the shuffle-free plan). The
    //    bucketed write happens once per JVM (offline index build); the
    //    query is the online read path. Prices are summed as exact
    //    integer cents (floor(p·100)) — order-free, so the bucketed
    //    execution order cannot change the hash vs the oracle. ──────────
    QueryDef.sorted(
      "q61_colocated_join",
      (s, dir) => {
        val orders = Bucketed.ensure(s, "orders_bycust", dir, "o_custkey", 8)(
          s.read.parquet(s"$dir/orders.parquet")
            .select("o_orderkey", "o_custkey", "o_totalprice"))
        val cust = Bucketed.ensure(s, "customer_bykey", dir, "c_custkey", 8)(
          s.read.parquet(s"$dir/customer.parquet")
            .select("c_custkey", "c_name", "c_acctbal"))
        s.table(cust)
          .join(s.table(orders), col("c_custkey") === col("o_custkey"))
          .groupBy(col("c_custkey"))
          .agg(count(lit(1)).as("n_orders"),
            sum(floor(col("o_totalprice") * 100).cast("long")).as("cents"),
            max(col("o_orderkey")).as("max_orderkey"))
      },
      _.orderBy("c_custkey"),
      Some(
        """SELECT c_custkey, count(*) AS n_orders,
          |       CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents,
          |       max(o_orderkey) AS max_orderkey
          |FROM customer JOIN orders ON c_custkey = o_custkey
          |GROUP BY c_custkey
          |ORDER BY c_custkey""".stripMargin)),

    // ── The reference's FULL routeData topology driven end-to-end
    //    through the pluggable sink (routeOp → routeData → relate
    //    fan-out → file content → doIndexing, monstache.go:3464-3495):
    //    app.t2 changes are a join-only relate source fanning out to
    //    supplier docs; each synthetic supplier op is stamped from its
    //    trigger and picks up base64 file content under the 60-byte cap
    //    (folded into the doc, addFileContent 1416-1432); the direct
    //    namespaces index as-is; deletes resolve statelessly against the
    //    post-upsert sink state with protection on, and t2 deletes are
    //    skipped entirely (skipDelete 3358-3369). The oracle replays the
    //    whole pipeline relationally: per-key LWW, mapping-resolved
    //    index names, the file cap, and the one delete effect an
    //    empty-bootstrap batch can have — a tombstone id whose ONLY live
    //    doc is a same-id supplier doc removes it when the tombstone
    //    outranks it (exactly-one-hit protection + the backend's
    //    versioned-delete fence). The backend dump is mock-sized by
    //    design (sinkState is the mock's own driver map); a fresh
    //    backend per invocation keeps the query body idempotent. ────────
    QueryDef.sorted(
      "q91_route_data_sink",
      (s, dir) => {
        import s.implicits._
        val cfg = GraftConfig(
          relates = Seq(Relation("app.t2", "app.supplier", "document.k",
            "s_suppkey", matchFieldType = Some("long"),
            broadcastRelated = true)),
          mappings = Map("app.supplier" -> "suppliers"),
          indexFiles = true,
          fileNamespaces = Seq("app.supplier"),
          maxFileSize = 60)
        // variable-length synthetic blob standing in for the GridFS
        // bytes (the small-SF supplier table carries no long text
        // column): 1-5 repeats of the name straddle the 60-byte cap
        val suppDocs = s.read.parquet(s"$dir/supplier.parquet")
          .select(col("s_suppkey").cast("string").as("id"),
            to_json(struct(col("s_name"), col("s_nationkey"))).as("document"),
            col("s_suppkey"),
            repeat(concat(col("s_name"), lit("#")),
              (col("s_suppkey") % 5 + 1).cast("int")).as("blob"))
        val routed = ConfiguredPipeline.routeData(cfg,
          collections = Map("app.supplier" -> suppDocs),
          fileContentCol = "blob")(EventLog.envelope(s, dir))
        val backend = new InMemorySinkBackend
        SinkWriter.writeBatch(routed, cfg, backend)
        backend.state.toSeq.map { case ((ix, id), d) =>
          (ix, id, d.version, d.document.contains("\"file\":"))
        }.toDF("meta_index", "id", "version", "has_file")
      },
      _.orderBy(col("meta_index"), col("id").cast("long")),
      Some(
        s"""WITH ${EventLog.oracleCte},
           |dw AS (
           |  SELECT namespace, id, operation, version FROM (
           |    SELECT namespace, id, operation, version,
           |           row_number() OVER (PARTITION BY namespace, id ORDER BY version DESC, event_id DESC) AS rn
           |    FROM envelope WHERE namespace <> 'app.t2') WHERE rn = 1),
           |synth AS (
           |  SELECT CAST(s.s_suppkey AS VARCHAR) AS id, e.version, e.event_id,
           |         repeat(s.s_name || '#', CAST(s.s_suppkey % 5 + 1 AS INT)) AS blob
           |  FROM envelope e JOIN supplier s
           |    ON CAST(json_extract_string(e.document, '$$.k') AS BIGINT) = s.s_suppkey
           |  WHERE e.namespace = 'app.t2' AND e.document IS NOT NULL),
           |sw AS (
           |  SELECT id, version, blob FROM (
           |    SELECT id, version, blob,
           |           row_number() OVER (PARTITION BY id ORDER BY version DESC, event_id DESC) AS rn
           |    FROM synth) WHERE rn = 1),
           |upserted AS (
           |  SELECT lower(namespace) AS meta_index, id, version, FALSE AS has_file
           |  FROM dw WHERE operation IN ('i', 'u')
           |  UNION ALL
           |  SELECT 'suppliers' AS meta_index, id, version,
           |         octet_length(encode(blob)) <= 60 AS has_file
           |  FROM sw),
           |tomb AS (SELECT id, version AS del_version FROM dw WHERE operation = 'd'),
           |hits AS (SELECT u.id, count(*) AS n_hits FROM upserted u JOIN tomb t ON u.id = t.id GROUP BY u.id)
           |SELECT u.meta_index, u.id, u.version, u.has_file
           |FROM upserted u
           |LEFT JOIN tomb t ON u.id = t.id
           |LEFT JOIN hits h ON u.id = h.id
           |WHERE t.id IS NULL OR h.n_hits <> 1 OR u.version >= t.del_version
           |ORDER BY u.meta_index, CAST(u.id AS BIGINT)""".stripMargin)),

    // ── The composite daemon batch (K1–K4 fencing interplay in ONE
    //    writeBatch): inserts + updates + deletes + drop_coll/drop_db +
    //    join-only relate fan-out + a patch namespace + a time-machine
    //    namespace, all in one batch against a fresh backend. What the
    //    oracle replays relationally:
    //      · per-(namespace, id) LWW winners, mapping-resolved indexes;
    //      · the IN-BATCH DROP FENCE — winners at or below their
    //        namespace's last covering drop version never land, with
    //        drop_db 'app' fencing the SYNTHETIC app.supplier docs too
    //        (the fence reads the routed batch's own namespaces);
    //      · relate semantics — app.t2 data ops fan out to suppliers,
    //        t2 deletes AND t2 drops vanish (join-only source: null doc
    //        joins nothing, and the seed filter owns every t2 op);
    //      · delete resolution with protection against the post-upsert
    //        state (exactly-one-hit), the tombstones themselves fenced,
    //        and the backend's versioned-delete fence on top;
    //      · K4 history: EVERY app.t0 data/delete op appends (before
    //        fences and LWW — the audit trail includes fenced ops) into
    //        dated log indexes;
    //      · the patch-namespace chains (delete-epoch renumbering) over
    //        app.t3.
    //    One kind-discriminated frame ('doc' | 'hist' | 'patch') pins
    //    the whole interplay cross-engine; q91 covers files + routing
    //    detail, q29 covers drop patterns — this row is the ordering
    //    semantics BETWEEN the K-layers. ───────────────────────────────
    QueryDef.sorted(
      "q171_daemon_composite",
      (s, dir) => {
        import s.implicits._
        val cfg = GraftConfig(
          relates = Seq(Relation("app.t2", "app.supplier", "document.k",
            "s_suppkey", matchFieldType = Some("long"),
            broadcastRelated = true)),
          mappings = Map("app.t1" -> "custom_t1",
            "app.supplier" -> "suppliers"),
          timeMachineNamespaces = Seq("app.t0"),
          patchNamespaces = Seq("app.t3"))
        val suppDocs = s.read.parquet(s"$dir/supplier.parquet")
          .select(col("s_suppkey").cast("string").as("id"),
            to_json(struct(col("s_name"), col("s_nationkey")))
              .as("document"),
            col("s_suppkey"))
        val env = EventLog.envelopeWithDrops(s, dir)
        val routed = ConfiguredPipeline.routeData(cfg,
          collections = Map("app.supplier" -> suppDocs))(env)
        val backend = new InMemorySinkBackend
        backend.bootstrap(cfg, SinkWriter.fileIndexes(cfg)) // K8 (no-op: no files)
        SinkWriter.writeBatch(routed, cfg, backend)
        val docs = backend.state.toSeq.map { case ((ix, id), d) =>
          ("doc", ix, id, d.version)
        }
        val hist = backend.history.toSeq.map { case (ix, id, v) =>
          ("hist", ix, id, v)
        }
        val local = (docs ++ hist).toDF("kind", "ix", "id", "v")
        val patches = PatchLog.pairs(env, cfg.patchNamespaces)
          .select(lit("patch").as("kind"), col("namespace").as("ix"),
            col("id"), col("v").cast("long").as("v"))
        local.unionByName(patches)
      },
      _.orderBy(col("kind"), col("ix"), expr("CAST(id AS BIGINT)"),
        col("v")),
      Some(
        s"""WITH ${EventLog.oracleCteWithDrops},
           |dropc AS (
           |  SELECT lower(namespace) AS d_ns, version AS d_version
           |  FROM envd WHERE operation = 'drop_coll'
           |    AND namespace <> 'app.t2'),
           |nsl AS (
           |  SELECT DISTINCT lower(namespace) AS ns FROM envd
           |  WHERE namespace LIKE 'app.t%' AND namespace <> 'app.t2'
           |  UNION ALL SELECT 'app.supplier'),
           |fence AS (
           |  SELECT ns, max(v) AS fence_v FROM (
           |    SELECT d_ns AS ns, d_version AS v FROM dropc
           |    UNION ALL
           |    SELECT nsl.ns, e.version FROM nsl, envd e
           |    WHERE e.operation = 'drop_db' AND e.db = 'app')
           |  GROUP BY ns),
           |dw AS (
           |  SELECT namespace, id, operation, version FROM (
           |    SELECT namespace, id, operation, version,
           |           row_number() OVER (PARTITION BY namespace, id
           |             ORDER BY version DESC, event_id DESC) AS rn
           |    FROM envd
           |    WHERE operation IN ('i', 'u', 'd')
           |      AND namespace <> 'app.t2') WHERE rn = 1),
           |synth AS (
           |  SELECT CAST(s.s_suppkey AS VARCHAR) AS id, e.version,
           |         e.event_id
           |  FROM envd e JOIN supplier s
           |    ON CAST(json_extract_string(e.document, '$$.k') AS BIGINT)
           |         = s.s_suppkey
           |  WHERE e.namespace = 'app.t2' AND e.document IS NOT NULL),
           |sw AS (
           |  SELECT id, version FROM (
           |    SELECT id, version,
           |           row_number() OVER (PARTITION BY id
           |             ORDER BY version DESC, event_id DESC) AS rn
           |    FROM synth) WHERE rn = 1),
           |up AS (
           |  SELECT CASE namespace WHEN 'app.t1' THEN 'custom_t1'
           |           ELSE lower(namespace) END AS ix,
           |         lower(namespace) AS ns, id, version
           |  FROM dw WHERE operation IN ('i', 'u')
           |  UNION ALL
           |  SELECT 'suppliers' AS ix, 'app.supplier' AS ns, id, version
           |  FROM sw),
           |upf AS (
           |  SELECT u.* FROM up u LEFT JOIN fence f ON u.ns = f.ns
           |  WHERE f.fence_v IS NULL OR u.version > f.fence_v),
           |tomb AS (
           |  SELECT t.id, t.version AS del_version FROM dw t
           |  LEFT JOIN fence f ON lower(t.namespace) = f.ns
           |  WHERE t.operation = 'd'
           |    AND (f.fence_v IS NULL OR t.version > f.fence_v)),
           |hits AS (
           |  SELECT u.id, count(*) AS n_hits FROM upf u
           |  JOIN tomb t ON u.id = t.id GROUP BY u.id),
           |docs AS (
           |  SELECT 'doc' AS kind, u.ix, u.id, u.version AS v
           |  FROM upf u
           |  LEFT JOIN tomb t ON u.id = t.id
           |  LEFT JOIN hits h ON u.id = h.id
           |  WHERE t.id IS NULL OR h.n_hits <> 1
           |     OR u.version >= t.del_version),
           |hist AS (
           |  SELECT 'hist' AS kind,
           |         'log.app.t0.' ||
           |           strftime(make_timestamp(ts_us), '%Y-%m-%d') AS ix,
           |         id, version AS v
           |  FROM envd
           |  WHERE namespace = 'app.t0' AND operation IN ('i', 'u', 'd')),
           |pat AS (
           |  SELECT 'patch' AS kind, namespace AS ix, id,
           |         CAST(row_number() OVER (
           |           PARTITION BY namespace, id, epoch
           |           ORDER BY version, event_id) AS BIGINT) AS v
           |  FROM (
           |    SELECT namespace, id, operation, version, event_id,
           |           sum(CASE WHEN operation = 'd' THEN 1 ELSE 0 END)
           |             OVER (PARTITION BY namespace, id
           |                   ORDER BY version, event_id
           |                   ROWS UNBOUNDED PRECEDING) AS epoch
           |    FROM envd
           |    WHERE namespace = 'app.t3'
           |      AND ((operation IN ('i', 'u') AND document IS NOT NULL)
           |           OR operation = 'd'))
           |  WHERE operation IN ('i', 'u'))
           |SELECT kind, ix, id, v FROM (
           |  SELECT * FROM docs
           |  UNION ALL SELECT * FROM hist
           |  UNION ALL SELECT * FROM pat)
           |ORDER BY kind, ix, CAST(id AS BIGINT), v""".stripMargin))
  )
}
