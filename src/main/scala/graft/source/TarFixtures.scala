package graft.source

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deterministic on-disk WebDataset-style tar corpus for the
  * container-ingestion queries (q234/q235) — the [[WarcFixtures]]
  * discipline applied to the multimodal shard front door: every
  * sampled document (`doc_id % 5 == 3`, non-null ASCII text/source)
  * becomes one SAMPLE of three adjacent members,
  * `sample_<id8>.img` / `.json` / `.txt` (lexicographic — the
  * WebDataset adjacency convention), samples group into three
  * `shard_<f>.tar` files (`f = (doc_id div 5) % 3`, samples in doc_id
  * order, zero-block terminated), and the SAME construction is
  * emitted once as driver-side Scala (the bytes on disk) and once as
  * the oracle CTE chain ([[sqlEntryCtes]]) — so DuckDB replays every
  * entry offset, size, mtime, and body hash from `documents.parquet`
  * with no filesystem access, and the thing under test is exactly
  * [[Tar.entries]]' walk over real 512-byte-framed bytes.
  *
  * Member contents (all ASCII, so char counts ARE byte counts on both
  * engines — the same guard as WARC):
  *  - `.img`: `repeat(md5(text), (doc_id div 5) % 3 + 1)` — a stand-in
  *    for opaque image bytes whose length varies per sample (32/64/96),
  *  - `.json`: `{"doc":<id>,"source":"<source>","nc":<n_chars>}`,
  *  - `.txt`: the document text itself.
  * mtime is `1704067200 + doc_id` (2024-01-01 + id seconds) so the
  * octal mtime parse is replayable by pure arithmetic. */
object TarFixtures {

  val SampleMod = 5L
  val SampleRem = 3L

  def key(docId: Long): String = f"sample_$docId%08d"

  def imgBody(md5Hex: String, docId: Long): String =
    md5Hex * (((docId / 5) % 3) + 1).toInt

  def jsonBody(docId: Long, source: String, nChars: Long): String =
    s"""{"doc":$docId,"source":"$source","nc":$nChars}"""

  def mtime(docId: Long): Long = 1704067200L + docId

  /** One 512-byte ustar header. `size`/`mtime` are 11-octal-digit +
    * space fields; chksum is 6 octal digits + NUL + space over the
    * header with the chksum field blanked to spaces. */
  def header(name: String, size: Long, mtimeSec: Long): Array[Byte] = {
    require(name.length <= 100, s"fixture name too long: $name")
    val b = new Array[Byte](512)
    def put(off: Int, s: String): Unit = {
      val bytes = s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      System.arraycopy(bytes, 0, b, off, bytes.length)
    }
    put(0, name)
    put(100, "0000644\u0000")
    put(108, "0000000\u0000")
    put(116, "0000000\u0000")
    put(124, f"$size%011o ")
    put(136, f"$mtimeSec%011o ")
    java.util.Arrays.fill(b, 148, 156, ' '.toByte)
    b(156) = '0'
    put(257, "ustar\u0000")
    put(263, "00")
    put(265, "graft")
    put(297, "graft")
    var sum = 0L
    b.foreach(x => sum += (x & 0xff))
    put(148, f"$sum%06o\u0000 ")
    b
  }

  /** One member: header + data padded to a 512 boundary. */
  def member(name: String, body: String, mtimeSec: Long): Array[Byte] = {
    val data = body.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val padded = ((data.length + 511) / 512) * 512
    val out = new Array[Byte](512 + padded)
    System.arraycopy(header(name, data.length.toLong, mtimeSec), 0, out, 0, 512)
    System.arraycopy(data, 0, out, 512, data.length)
    out
  }

  // ── DuckDB twins ──────────────────────────────────────────────────────

  /** Oracle CTE chain over `documents`:
    * `tsrc` (sample: doc_id, source, text, n_chars, file_id) →
    * `tent` (one row per member: ext_idx 0=img/1=json/2=txt, name,
    * body) → `toff` (+size, padded, entry_off via a cumulative-sum
    * window in (doc_id, ext_idx) order per file). `len(body)` IS the
    * size because the sample is ASCII-guarded. */
  def sqlEntryCtes: String =
    s"""tsrc AS (
       |  SELECT doc_id, source, text, n_chars, (doc_id // 5) % 3 AS file_id,
       |         'sample_' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS skey
       |  FROM documents
       |  WHERE doc_id % $SampleMod = $SampleRem AND text IS NOT NULL
       |    AND source IS NOT NULL AND n_chars IS NOT NULL
       |    AND strlen(text) = length(text)),
       |tent AS (
       |  SELECT tsrc.*, ei AS ext_idx,
       |    skey || CASE ei WHEN 0 THEN '.img' WHEN 1 THEN '.json'
       |                    ELSE '.txt' END AS name,
       |    CASE ei
       |      WHEN 0 THEN repeat(md5(text),
       |                         CAST((doc_id // 5) % 3 + 1 AS INT))
       |      WHEN 1 THEN '{"doc":' || doc_id || ',"source":"' || source ||
       |                  '","nc":' || n_chars || '}'
       |      ELSE text END AS body
       |  FROM tsrc CROSS JOIN (SELECT unnest([0, 1, 2]) AS ei)),
       |toff AS (
       |  SELECT *, len(body) AS size,
       |    1704067200 + doc_id AS mtime,
       |    coalesce(sum(512 + ((len(body) + 511) // 512) * 512)
       |      OVER (PARTITION BY file_id ORDER BY doc_id, ext_idx
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |      0) AS entry_off
       |  FROM tent)""".stripMargin

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

  def ensure(spark: SparkSession, sfDir: String): String = {
    val out = Paths.get("target", "tarfixtures",
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
      // id + source + text + n_chars + md5)
      val rows = spark.read.parquet(s"$sfDir/documents.parquet")
        .filter(col("doc_id") % SampleMod === SampleRem &&
          col("text").isNotNull && col("source").isNotNull &&
          col("n_chars").isNotNull &&
          octet_length(col("text")) === length(col("text")))
        .select(col("doc_id").cast("long"), col("source"), col("text"),
          col("n_chars").cast("long"), md5(col("text")).as("h"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getLong(3), r.getString(4)))
        .sortBy(_._1)
      rows.groupBy { case (id, _, _, _, _) => (id / 5) % 3 }.foreach {
        case (fileId, docs) =>
          val bos = new java.io.ByteArrayOutputStream()
          docs.sortBy(_._1).foreach { case (id, src, txt, nc, h) =>
            val k = key(id)
            val mt = mtime(id)
            bos.write(member(s"$k.img", imgBody(h, id), mt))
            bos.write(member(s"$k.json", jsonBody(id, src, nc), mt))
            bos.write(member(s"$k.txt", txt, mt))
          }
          bos.write(new Array[Byte](1024)) // end-of-archive zero blocks
          Files.write(out.resolve(s"shard_$fileId.tar"), bos.toByteArray)
      }
      Files.write(marker, sig.getBytes("UTF-8"))
    }
    validated.add(sfDir)
    out.toAbsolutePath.toString
  }
}
