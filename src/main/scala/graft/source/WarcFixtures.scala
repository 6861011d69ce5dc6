package graft.source

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deterministic on-disk WARC corpus for the container-ingestion
  * queries (q222/q223) — the [[BinaryFixtures]] discipline applied to
  * the crawl front door: every sampled document (`doc_id % 5 == 2`,
  * non-null ASCII text/source) becomes one `response` record whose
  * HTTP payload is a small derived HTML page (404 and non-HTML JSON
  * arms planted by id arithmetic), records group into four
  * `crawl_<f>.warc` files (`f = (doc_id div 5) % 4`, records in
  * doc_id order behind a leading `warcinfo` record), and the SAME
  * construction is emitted once as driver-side Scala (the bytes on
  * disk) and once as the oracle CTE chain ([[sqlRecordCtes]]) — so
  * DuckDB replays every member offset, header field, and payload hash
  * from `documents.parquet` with no filesystem access, and the thing
  * under test is exactly [[Warc.members]]' walk over real bytes.
  *
  * Each `.warc` also gets a `.warc.gz` twin (one gzip member per
  * record — the Common Crawl layout) for the spec-level gzip-path
  * tests; queries read only `*.warc` (the offsets of deflate output
  * are not SQL-replayable, stated).
  *
  * ASCII guard: record lengths are char counts on both engines, so
  * the sample keeps only docs whose UTF-8 byte length equals the char
  * length (true for the whole synthetic corpus — the predicate is the
  * stated contract, mirrored in the CTE). */
object WarcFixtures {

  val Crlf = "\r\n"
  val InfoPayload: String = s"software: graft-fetcher/1.0$Crlf"
  val NotFoundPage = "<html><body><p>gone</p></body></html>"

  /** The file-leading warcinfo record. */
  def infoRecord(fileId: Long): String =
    s"WARC/1.0${Crlf}WARC-Type: warcinfo${Crlf}" +
      s"WARC-Record-ID: <urn:graft:info-$fileId>${Crlf}" +
      s"WARC-Date: 2024-01-01T00:00:00Z${Crlf}" +
      s"Content-Type: application/warc-fields${Crlf}" +
      s"Content-Length: ${InfoPayload.length}$Crlf$Crlf" +
      s"$InfoPayload$Crlf$Crlf"

  /** The derived HTML page: title + h1 + 8-word sentence paragraphs. */
  def htmlPage(docId: Long, ws: Array[String]): String = {
    val nch = math.max((ws.length + 7) / 8, 1)
    val paras = (0 until nch).map(i =>
      "<p>" + ws.slice(i * 8, i * 8 + 8).mkString(" ") + ".</p>").mkString
    s"<html><head><title>doc $docId</title></head><body>" +
      s"<h1>${ws.take(3).mkString(" ")}</h1>$paras</body></html>"
  }

  /** One response record (headers + HTTP block + trailer). */
  def record(docId: Long, source: String, text: String): String = {
    val ws = graft.llm.TextHash.wordsScala(text)
    val is404 = docId % 10 == 7
    val isJson = docId % 20 == 12
    val payload =
      if (is404) NotFoundPage
      else if (isJson) s"""{"doc":$docId}"""
      else htmlPage(docId, ws)
    val mime = if (isJson) "application/json" else "text/html; charset=utf-8"
    val statusLine =
      if (is404) "HTTP/1.1 404 Not Found" else "HTTP/1.1 200 OK"
    val http = s"$statusLine${Crlf}Content-Type: $mime$Crlf$Crlf$payload"
    val host = s"$source-${docId % 50}.com"
    val date = f"2024-01-${docId % 28 + 1}%02dT00:00:00Z"
    s"WARC/1.0${Crlf}WARC-Type: response${Crlf}" +
      s"WARC-Record-ID: <urn:graft:$docId>${Crlf}" +
      s"WARC-Date: $date${Crlf}" +
      s"WARC-Target-URI: https://$host/d/$docId${Crlf}" +
      s"Content-Type: application/http; msgtype=response${Crlf}" +
      s"Content-Length: ${http.length}$Crlf$Crlf$http$Crlf$Crlf"
  }

  // ── DuckDB twins ──────────────────────────────────────────────────────

  private val C = "chr(13) || chr(10)"

  /** Oracle CTE chain over `documents`:
    * `wsrc` (sample) → `wpay` (file_id, doc_id, status, mime, payload,
    * uri, wdate) → `whttp` (+http) → `wall` (+rec — the full record
    * string, so `len(rec)` IS the member length). */
  def sqlRecordCtes: String = {
    val ws = graft.llm.TextHash.sqlWords("text")
    s"""wsrc AS (
       |  SELECT doc_id, source, $ws AS ws FROM documents
       |  WHERE doc_id % 5 = 2 AND text IS NOT NULL AND source IS NOT NULL
       |    AND strlen(text) = length(text)),
       |wpay AS (
       |  SELECT (doc_id // 5) % 4 AS file_id, doc_id,
       |    CASE WHEN doc_id % 10 = 7 THEN 404 ELSE 200 END AS status,
       |    CASE WHEN doc_id % 20 = 12 THEN 'application/json'
       |         ELSE 'text/html; charset=utf-8' END AS mime,
       |    CASE WHEN doc_id % 10 = 7 THEN '$NotFoundPage'
       |         WHEN doc_id % 20 = 12 THEN '{"doc":' || doc_id || '}'
       |         ELSE '<html><head><title>doc ' || doc_id ||
       |              '</title></head><body><h1>' ||
       |              array_to_string(ws[1:3], ' ') || '</h1>' ||
       |              array_to_string(list_transform(
       |                range(0, greatest(CAST(floor((len(ws)+7)/8) AS INT), 1)),
       |                i -> '<p>' ||
       |                     array_to_string(list_slice(ws, i*8+1, i*8+8), ' ') ||
       |                     '.</p>'), '') ||
       |              '</body></html>' END AS payload,
       |    'https://' || source || '-' || (doc_id % 50) || '.com/d/' ||
       |      doc_id AS uri,
       |    '2024-01-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') ||
       |      'T00:00:00Z' AS wdate
       |  FROM wsrc),
       |whttp AS (
       |  SELECT *, (CASE WHEN status = 404 THEN 'HTTP/1.1 404 Not Found'
       |                  ELSE 'HTTP/1.1 200 OK' END) || $C ||
       |            'Content-Type: ' || mime || $C || $C || payload AS http
       |  FROM wpay),
       |wall AS (
       |  SELECT *, 'WARC/1.0' || $C || 'WARC-Type: response' || $C ||
       |    'WARC-Record-ID: <urn:graft:' || doc_id || '>' || $C ||
       |    'WARC-Date: ' || wdate || $C ||
       |    'WARC-Target-URI: ' || uri || $C ||
       |    'Content-Type: application/http; msgtype=response' || $C ||
       |    'Content-Length: ' || len(http) || $C || $C ||
       |    http || $C || $C AS rec
       |  FROM whttp)""".stripMargin
  }

  /** Twin of [[infoRecord]] over a file-id expression. */
  def sqlInfoRec(fid: String): String =
    s"'WARC/1.0' || $C || 'WARC-Type: warcinfo' || $C || " +
      s"'WARC-Record-ID: <urn:graft:info-' || $fid || '>' || $C || " +
      s"'WARC-Date: 2024-01-01T00:00:00Z' || $C || " +
      s"'Content-Type: application/warc-fields' || $C || " +
      s"'Content-Length: ${InfoPayload.length}' || $C || $C || " +
      s"'software: graft-fetcher/1.0' || $C || $C || $C"

  // ── generation (BinaryFixtures' signature-cached layout) ─────────────

  private val validated =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def sourceSig(src: Path): String = {
    val walk = Files.walk(src)
    try {
      val entries = new java.util.ArrayList[String]()
      walk.filter(p => Files.isRegularFile(p))
        .forEach(p => entries.add(
          s"${p.toAbsolutePath}|${Files.size(p)}|${Files.getLastModifiedTime(p).toMillis}"))
      entries.sort(Comparator.naturalOrder[String]())
      String.join("\n", entries)
    } finally walk.close()
  }

  private def gzipMember(s: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    gz.close()
    bos.toByteArray
  }

  def ensure(spark: SparkSession, sfDir: String): String = {
    val out = Paths.get("target", "warcfixtures",
      sfDir.replaceAll("[^A-Za-z0-9]", "_"))
    if (validated.contains(sfDir)) return out.toAbsolutePath.toString
    val marker = out.resolve("_SUCCESS")
    val sig = s"$sfDir\n${sourceSig(Paths.get(sfDir, "documents.parquet"))}"
    val fresh = Files.exists(marker) &&
      new String(Files.readAllBytes(marker), "UTF-8") == sig
    if (!fresh) {
      if (Files.exists(out)) {
        val walk = Files.walk(out)
        try walk.sorted(Comparator.reverseOrder[Path]())
          .forEach(p => Files.delete(p))
        finally walk.close()
      }
      Files.createDirectories(out)
      // fixture-sized collect: the sampled slice only (1/5th of docs,
      // id + source + text)
      val rows = spark.read.parquet(s"$sfDir/documents.parquet")
        .filter(col("doc_id") % 5 === 2 && col("text").isNotNull &&
          col("source").isNotNull &&
          octet_length(col("text")) === length(col("text")))
        .select(col("doc_id").cast("long"), col("source"), col("text"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .sortBy(_._1)
      val iso = java.nio.charset.StandardCharsets.ISO_8859_1
      rows.groupBy { case (id, _, _) => (id / 5) % 4 }.foreach {
        case (fileId, docs) =>
          val recs = infoRecord(fileId) +:
            docs.sortBy(_._1).map { case (id, src, txt) =>
              record(id, src, txt)
            }.toSeq
          Files.write(out.resolve(s"crawl_$fileId.warc"),
            recs.mkString.getBytes(iso))
          val gz = new java.io.ByteArrayOutputStream()
          recs.foreach(r => gz.write(gzipMember(r)))
          Files.write(out.resolve(s"crawl_$fileId.warc.gz"),
            gz.toByteArray)
      }
      Files.write(marker, sig.getBytes("UTF-8"))
    }
    validated.add(sfDir)
    out.toAbsolutePath.toString
  }
}
