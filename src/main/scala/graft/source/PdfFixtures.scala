package graft.source

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deterministic on-disk PDF corpus for the q228/q229 parsing queries
  * — the [[WarcFixtures]] discipline on the PDF container: every
  * sampled document (`doc_id % 7 == 3`, non-null ASCII text) becomes
  * `doc_<id>.pdf`, a classic-xref PDF with catalog → pages → page →
  * UNCOMPRESSED content stream objects (two pages when
  * `doc_id % 4 == 1`), each stream carrying one `(…) Tj` and one
  * `[(…) -120 (…)] TJ` built from the doc's words. The same
  * construction is emitted as driver-side Scala (the bytes) and as
  * the oracle CTE chain ([[sqlObjectCtes]]), so DuckDB replays every
  * object offset, the xref table's claims, stream lengths, and the
  * extracted text from `documents.parquet` alone — the thing under
  * test is [[Pdf.objects]]/[[Pdf.textCensus]] over real bytes. */
object PdfFixtures {

  private val Lf = "\n"

  /** Per-page content stream: 4-word Tj + a 2+2-word TJ array. */
  def pageStream(ws: Array[String], i: Int): String = {
    def seg(from: Int, n: Int) = ws.slice(from, from + n).mkString(" ")
    s"BT (${seg(8 * i, 4)}) Tj [(${seg(8 * i + 4, 2)}) -120 " +
      s"(${seg(8 * i + 6, 2)})] TJ ET"
  }

  /** The full file text for one doc. */
  def pdfFile(docId: Long, text: String): String = {
    val ws = graft.llm.TextHash.wordsScala(text)
    val np = if (docId % 4 == 1) 2 else 1
    val streams = (0 until np).map(pageStream(ws, _))
    val kids = (0 until np).map(i => s"${3 + 2 * i} 0 R").mkString(" ")
    val objs = Seq(
      s"1 0 obj$Lf<< /Type /Catalog /Pages 2 0 R >>${Lf}endobj$Lf",
      s"2 0 obj$Lf<< /Type /Pages /Kids [$kids] /Count $np >>" +
        s"${Lf}endobj$Lf") ++
      (0 until np).flatMap(i => Seq(
        s"${3 + 2 * i} 0 obj$Lf<< /Type /Page /Parent 2 0 R " +
          s"/Contents ${4 + 2 * i} 0 R >>${Lf}endobj$Lf",
        s"${4 + 2 * i} 0 obj$Lf<< /Length ${streams(i).length} >>" +
          s"${Lf}stream$Lf${streams(i)}${Lf}endstream${Lf}endobj$Lf"))
    val header = "%PDF-1.4\n"
    val offs = objs.scanLeft(header.length.toLong)(_ + _.length).init
    val xrefOff = header.length + objs.map(_.length).sum
    val xref = s"xref${Lf}0 ${objs.length + 1}$Lf" +
      "0000000000 65535 f \n" +
      offs.map(o => f"$o%010d 00000 n \n").mkString
    val trailer = s"trailer$Lf<< /Size ${objs.length + 1} /Root 1 0 R >>" +
      s"${Lf}startxref$Lf$xrefOff$Lf%%EOF$Lf"
    header + objs.mkString + xref + trailer
  }

  // ── DuckDB twins ──────────────────────────────────────────────────────

  /** Oracle CTE chain over `documents` → `poffs(doc_id, np, onum, obj,
    * off, ss)`: the object strings in file order with their offsets
    * (header is 9 bytes), plus the per-page stream list `ss`. */
  def sqlObjectCtes: String = {
    val ws = graft.llm.TextHash.sqlWords("text")
    val C = "chr(10)"
    def seg(from: String, n: Int) =
      s"array_to_string(list_slice(ws, $from, $from + ${n - 1}), ' ')"
    s"""psrc AS (
       |  SELECT doc_id, $ws AS ws FROM documents
       |  WHERE doc_id % 7 = 3 AND text IS NOT NULL
       |    AND strlen(text) = length(text)),
       |pparts AS (SELECT doc_id,
       |             (CASE WHEN doc_id % 4 = 1 THEN 2 ELSE 1 END) AS np,
       |             ws
       |           FROM psrc),
       |pstreams AS (
       |  SELECT doc_id, np, list_transform(range(0, np), i ->
       |    'BT (' || ${seg("i*8 + 1", 4)} || ') Tj [(' ||
       |    ${seg("i*8 + 5", 2)} || ') -120 (' ||
       |    ${seg("i*8 + 7", 2)} || ')] TJ ET') AS ss
       |  FROM pparts),
       |pobjs AS (
       |  SELECT doc_id, np, ss,
       |    ['1 0 obj' || $C || '<< /Type /Catalog /Pages 2 0 R >>' ||
       |       $C || 'endobj' || $C,
       |     '2 0 obj' || $C || '<< /Type /Pages /Kids [' ||
       |       (CASE WHEN np = 2 THEN '3 0 R 5 0 R' ELSE '3 0 R' END) ||
       |       '] /Count ' || np || ' >>' || $C || 'endobj' || $C] ||
       |    flatten(list_transform(range(0, np), i -> [
       |      (3 + 2*i) || ' 0 obj' || $C ||
       |        '<< /Type /Page /Parent 2 0 R /Contents ' || (4 + 2*i) ||
       |        ' 0 R >>' || $C || 'endobj' || $C,
       |      (4 + 2*i) || ' 0 obj' || $C || '<< /Length ' ||
       |        length(ss[i+1]) || ' >>' || $C || 'stream' || $C ||
       |        ss[i+1] || $C || 'endstream' || $C || 'endobj' || $C]))
       |      AS objs
       |  FROM pstreams),
       |prows AS (SELECT doc_id, np, ss, unnest(objs) AS obj,
       |                 unnest(range(1, len(objs) + 1)) AS onum
       |          FROM pobjs),
       |poffs AS (
       |  SELECT doc_id, np, ss, onum, obj,
       |         9 + coalesce(sum(len(obj)) OVER (PARTITION BY doc_id
       |           ORDER BY onum ROWS BETWEEN UNBOUNDED PRECEDING AND
       |           1 PRECEDING), 0) AS off
       |  FROM prows)""".stripMargin
  }

  // ── generation ────────────────────────────────────────────────────────

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

  def ensure(spark: SparkSession, sfDir: String): String = {
    val out = Paths.get("target", "pdffixtures",
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
      val iso = java.nio.charset.StandardCharsets.ISO_8859_1
      spark.read.parquet(s"$sfDir/documents.parquet")
        .filter(col("doc_id") % 7 === 3 && col("text").isNotNull &&
          octet_length(col("text")) === length(col("text")))
        .select(col("doc_id").cast("long"), col("text"))
        .collect()
        .foreach { r =>
          Files.write(out.resolve(s"doc_${r.getLong(0)}.pdf"),
            pdfFile(r.getLong(0), r.getString(1)).getBytes(iso))
        }
      Files.write(marker, sig.getBytes("UTF-8"))
    }
    validated.add(sfDir)
    out.toAbsolutePath.toString
  }
}
