package graft.source

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deterministic on-disk ZIP corpus for the container-ingestion
  * queries (q245/q246) — the [[TarFixtures]] discipline applied to the
  * ZIP front door: every sampled document (`doc_id % 5 == 1`, non-null
  * ASCII text/source) becomes TWO members, `doc_<id8>.txt` (method 0,
  * stored — the document text verbatim) and `doc_<id8>.json` (method
  * 8, deflate — the metadata record), members in (doc_id, ext) order
  * inside three `archive_<f>.zip` files (`f = (doc_id div 5) % 3`),
  * each a fully spec-shaped archive: local file headers, central
  * directory, EOCD.
  *
  * The method-8 members are framed as single DEFLATE STORED blocks
  * (`01 len nlen data` — RFC 1951 §3.2.4): a legitimate deflate
  * stream [[Zip.entries]]' `Inflater` decodes for real, whose
  * compressed size is PURE ARITHMETIC (`usize + 5`) — so the DuckDB
  * oracle replays every local-header offset, data offset, and
  * central-directory offset from `documents.parquet` as padded
  * cumulative sums ([[sqlEntryCtes]]), with no filesystem access and
  * no compressor in the loop. CRC-32 is real on the write side and
  * re-verified on the read side; the oracle pins `crc_ok = true`
  * (SQL has no CRC — the VALUE is engine-verified, the FLAG is
  * oracle-pinned).
  *
  * DOS timestamps are derived arithmetically from doc_id
  * ([[dosTime]]/[[DosDate]]) so the packed-field parse is replayable. */
object ZipFixtures {

  val SampleMod = 5L
  val SampleRem = 1L

  def key(docId: Long): String = f"doc_$docId%08d"

  def jsonBody(docId: Long, source: String, nChars: Long): String =
    s"""{"doc":$docId,"source":"$source","nc":$nChars}"""

  /** Packed MS-DOS time: hour<<11 | minute<<5 | seconds/2. */
  def dosTime(docId: Long): Long =
    ((docId % 24) << 11) | ((docId % 60) << 5) | (docId % 30)

  /** Packed MS-DOS date: 2024-01-15 for every member. */
  val DosDate: Long = ((2024 - 1980) << 9) | (1 << 5) | 15

  private val Iso = java.nio.charset.StandardCharsets.ISO_8859_1

  private def u16(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  private def u32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** RFC 1951 single stored-block deflate framing: csize = len + 5. */
  def deflateStored(data: Array[Byte]): Array[Byte] = {
    require(data.length <= 65535, "fixture member exceeds one block")
    val len = data.length
    Array(0x01.toByte) ++ u16(len.toLong) ++ u16((~len & 0xffff).toLong) ++
      data
  }

  private def crc32(data: Array[Byte]): Long = {
    val c = new java.util.zip.CRC32()
    c.update(data)
    c.getValue
  }

  /** One member's (local-header+data bytes, central-directory entry
    * bytes minus the offset field, raw sizes). */
  final case class Member(name: String, method: Int, data: Array[Byte],
                          time: Long, date: Long) {
    val payload: Array[Byte] =
      if (method == 0) data else deflateStored(data)
    val crc: Long = crc32(data)
    def local: Array[Byte] =
      Array(0x50, 0x4b, 0x03, 0x04).map(_.toByte) ++
        u16(20) ++ u16(0) ++ u16(method.toLong) ++ u16(time) ++ u16(date) ++
        u32(crc) ++ u32(payload.length.toLong) ++ u32(data.length.toLong) ++
        u16(name.length.toLong) ++ u16(0) ++ name.getBytes(Iso) ++ payload
    def central(localOff: Long): Array[Byte] =
      Array(0x50, 0x4b, 0x01, 0x02).map(_.toByte) ++
        u16(20) ++ u16(20) ++ u16(0) ++ u16(method.toLong) ++ u16(time) ++
        u16(date) ++ u32(crc) ++ u32(payload.length.toLong) ++
        u32(data.length.toLong) ++ u16(name.length.toLong) ++ u16(0) ++
        u16(0) ++ u16(0) ++ u16(0) ++ u32(0) ++ u32(localOff) ++
        name.getBytes(Iso)
  }

  /** Assemble one spec-shaped archive from members in order. */
  def archive(members: Seq[Member]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val localOffs = members.map { m =>
      val off = bos.size().toLong
      bos.write(m.local)
      off
    }
    val cdOff = bos.size().toLong
    members.zip(localOffs).foreach { case (m, off) => bos.write(m.central(off)) }
    val cdSize = bos.size().toLong - cdOff
    bos.write(Array(0x50, 0x4b, 0x05, 0x06).map(_.toByte))
    bos.write(u16(0)); bos.write(u16(0))
    bos.write(u16(members.size.toLong)); bos.write(u16(members.size.toLong))
    bos.write(u32(cdSize)); bos.write(u32(cdOff))
    bos.write(u16(0))
    bos.toByteArray
  }

  // ── DuckDB twins ──────────────────────────────────────────────────────

  /** Oracle CTE chain over `documents`:
    * `zsrc` (sampled doc + file_id + key) → `zent` (one row per member:
    * m_idx 0=txt/1=json, name, body, method) → `zoff` (+usize/csize/
    * name length, local_off and central-directory offsets via
    * cumulative-sum windows in (doc_id, m_idx) order per file).
    * `len(body)` IS usize because the sample is ASCII-guarded;
    * method-8 csize is `usize + 5` (the stored-block framing). */
  def sqlEntryCtes: String =
    s"""zsrc AS (
       |  SELECT doc_id, source, text, n_chars, (doc_id // 5) % 3 AS file_id,
       |         'doc_' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS dkey
       |  FROM documents
       |  WHERE doc_id % $SampleMod = $SampleRem AND text IS NOT NULL
       |    AND source IS NOT NULL AND n_chars IS NOT NULL
       |    AND strlen(text) = length(text)),
       |zent AS (
       |  SELECT zsrc.*, mi AS m_idx,
       |    dkey || CASE mi WHEN 0 THEN '.txt' ELSE '.json' END AS name,
       |    CASE mi WHEN 0 THEN text
       |      ELSE '{"doc":' || doc_id || ',"source":"' || source ||
       |           '","nc":' || n_chars || '}' END AS body,
       |    CASE mi WHEN 0 THEN 0 ELSE 8 END AS method
       |  FROM zsrc CROSS JOIN (SELECT unnest([0, 1]) AS mi)),
       |zsz AS (
       |  SELECT *, len(body) AS usize,
       |    CASE WHEN method = 0 THEN len(body)
       |         ELSE len(body) + 5 END AS csize,
       |    len(name) AS nlen,
       |    (doc_id % 24) * 2048 + (doc_id % 60) * 32 + (doc_id % 30)
       |      AS dos_time,
       |    $DosDate AS dos_date
       |  FROM zent),
       |zoff AS (
       |  SELECT *,
       |    coalesce(sum(30 + nlen + csize)
       |      OVER (PARTITION BY file_id ORDER BY doc_id, m_idx
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |      0) AS local_off,
       |    sum(30 + nlen + csize) OVER (PARTITION BY file_id) AS lsum,
       |    coalesce(sum(46 + nlen)
       |      OVER (PARTITION BY file_id ORDER BY doc_id, m_idx
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |      0) AS cd_rel
       |  FROM zsz)""".stripMargin

  // ── generation (TarFixtures' signature-cached layout) ────────────────

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
    val out = Paths.get("target", "zipfixtures",
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
      // fixture-sized collect: the sampled slice only (1/5th of docs)
      val rows = spark.read.parquet(s"$sfDir/documents.parquet")
        .filter(col("doc_id") % SampleMod === SampleRem &&
          col("text").isNotNull && col("source").isNotNull &&
          col("n_chars").isNotNull &&
          octet_length(col("text")) === length(col("text")))
        .select(col("doc_id").cast("long"), col("source"), col("text"),
          col("n_chars").cast("long"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getLong(3)))
        .sortBy(_._1)
      rows.groupBy { case (id, _, _, _) => (id / 5) % 3 }.foreach {
        case (fileId, docs) =>
          val members = docs.sortBy(_._1).flatMap { case (id, src, txt, nc) =>
            val k = key(id)
            Seq(
              Member(s"$k.txt", 0, txt.getBytes(Iso), dosTime(id), DosDate),
              Member(s"$k.json", 8, jsonBody(id, src, nc).getBytes(Iso),
                dosTime(id), DosDate))
          }
          Files.write(out.resolve(s"archive_$fileId.zip"), archive(members))
      }
      Files.write(marker, sig.getBytes("UTF-8"))
    }
    validated.add(sfDir)
    out.toAbsolutePath.toString
  }
}
