package graft.queries

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.operators.{FileContent, Lookups}
import graft.source.Discovery

/** Source/lookup queries: dynamic namespace discovery (S4), GridFS-analog
  * file content (S7), the findId/findOne script builtins (J4), and the
  * multimodal asset schema. */
object SourceQueries extends QueryFamily {

  val queries: Seq[QueryDef] = Seq(

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
          |ORDER BY namespace""".stripMargin))
  )
}
