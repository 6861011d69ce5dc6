package graft.source

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ZIP container ingestion — the third container front door next to
  * [[Warc]] (crawl archives) and [[Tar]] (WebDataset shards): scraped
  * document bundles, EPUB/DOCX-style corpora, and code archives all
  * arrive as ZIPs. Same bytes-in/documents-out contract as the
  * reference's S7 file fetch (reference: monstache.go:1405-1433).
  *
  * A ZIP is parsed from the END, the way real readers do (APPNOTE.TXT
  * layout): locate the end-of-central-directory record (EOCD,
  * `PK\x05\x06`) by scanning backward through the trailing comment
  * window, jump to the central directory (`PK\x01\x02` entries — name,
  * method, sizes, CRC-32, DOS timestamp, local-header offset), and
  * resolve each member's data offset through its local file header
  * (`PK\x03\x04`, whose name/extra lengths may differ from the CD's).
  * Member bodies decode for method 0 (stored) and method 8 (deflate,
  * via `java.util.zip.Inflater` in raw mode); the stored CRC-32 is
  * re-verified over the decoded bytes and carried as `crc_ok` so a
  * census can quarantine corrupt members instead of silently
  * ingesting them.
  *
  * Scale shape: the unit of parallelism is the archive file —
  * `binaryFile` partitions by file, each archive parses sequentially
  * and independently in one narrow pass riding the scan; local/data
  * byte offsets travel so a decode stage can range-read members from
  * the original object. The whole-file in-memory walk below is a
  * fixture-scale simplification (stated); the central-directory walk
  * itself is already single-pass.
  *
  * Fail-closed parsing: no EOCD → no entries; a broken central-
  * directory entry stops the walk and returns the entries parsed so
  * far (corrupt tails degrade to fewer members, never misaligned
  * garbage); a local header that contradicts the CD (missing
  * signature, truncated data) keeps the CD row but yields
  * `data_off = -1`, an empty body, and `crc_ok = false` — quarantine
  * signals, not silent drops. */
object Zip {

  /** One parsed member. Offsets are file-absolute bytes; `method` is
    * the raw compression method (0 stored, 8 deflate); `body` is the
    * DECODED member data (ISO-8859-1, 1:1 byte↔char) for supported
    * methods, empty otherwise; `dos_time`/`dos_date` are the packed
    * MS-DOS fields exactly as stored. */
  final case class Entry(cd_off: Long, local_off: Long, data_off: Long,
                         name: String, method: Long, csize: Long,
                         usize: Long, dos_time: Long, dos_date: Long,
                         crc_ok: Boolean, body: String)

  private val Iso = java.nio.charset.StandardCharsets.ISO_8859_1

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def sigAt(b: Array[Byte], off: Int, c3: Int, c4: Int): Boolean =
    off + 4 <= b.length && (b(off) & 0xff) == 0x50 &&
      (b(off + 1) & 0xff) == 0x4b && (b(off + 2) & 0xff) == c3 &&
      (b(off + 3) & 0xff) == c4

  /** Backward scan for the EOCD record (last 64 KiB + 22 — the spec's
    * maximal comment window). None → not a ZIP / truncated. */
  private def findEocd(b: Array[Byte]): Option[Int] = {
    var pos = b.length - 22
    val floor = math.max(0, b.length - 22 - 65535)
    while (pos >= floor) {
      if (sigAt(b, pos, 0x05, 0x06) &&
        pos + 22 + u16(b, pos + 20) == b.length) return Some(pos)
      pos -= 1
    }
    None
  }

  /** Decode a member's data; None on unsupported method or a broken
    * deflate stream (fail closed). */
  private def decode(b: Array[Byte], off: Int, csize: Int, usize: Int,
                     method: Int): Option[Array[Byte]] =
    method match {
      case 0 =>
        if (off + csize <= b.length) Some(b.slice(off, off + csize))
        else None
      case 8 =>
        if (off + csize > b.length) return None
        val inf = new java.util.zip.Inflater(true)
        try {
          inf.setInput(b, off, csize)
          val out = new Array[Byte](usize)
          var done = 0
          while (done < usize && !inf.finished()) {
            val n = inf.inflate(out, done, usize - done)
            if (n == 0 && inf.needsInput()) return None // truncated
            done += n
          }
          if (done == usize) Some(out) else None
        } catch {
          case _: java.util.zip.DataFormatException => None
        } finally inf.end()
      case _ => None
    }

  /** Parse a ZIP archive's bytes into members (see class doc). */
  def entries(bytes: Array[Byte]): Seq[Entry] = {
    if (bytes == null) return Nil
    val eocd = findEocd(bytes) match {
      case Some(p) => p
      case None => return Nil
    }
    val cdOff = u32(bytes, eocd + 16)
    val cdSize = u32(bytes, eocd + 12)
    if (cdOff + cdSize > eocd) return Nil // directory past its own end
    val out = Seq.newBuilder[Entry]
    var pos = cdOff.toInt
    val cdEnd = (cdOff + cdSize).toInt
    while (pos + 46 <= cdEnd && sigAt(bytes, pos, 0x01, 0x02)) {
      val method = u16(bytes, pos + 10)
      val dosTime = u16(bytes, pos + 12)
      val dosDate = u16(bytes, pos + 14)
      val crc = u32(bytes, pos + 16)
      val csize = u32(bytes, pos + 20)
      val usize = u32(bytes, pos + 24)
      val nameLen = u16(bytes, pos + 28)
      val extraLen = u16(bytes, pos + 30)
      val commentLen = u16(bytes, pos + 32)
      val localOff = u32(bytes, pos + 42)
      if (pos + 46 + nameLen > cdEnd) return out.result()
      val name = new String(bytes, pos + 46, nameLen, Iso)
      // resolve data offset through the LOCAL header (its name/extra
      // lengths govern the data position, not the CD's)
      val lp = localOff.toInt
      val (dataOff, body, crcOk) =
        if (!sigAt(bytes, lp, 0x03, 0x04) || lp + 30 > bytes.length)
          (-1L, "", false)
        else {
          val dOff = localOff + 30 + u16(bytes, lp + 26) + u16(bytes, lp + 28)
          decode(bytes, dOff.toInt, csize.toInt, usize.toInt, method) match {
            case Some(data) =>
              val c = new java.util.zip.CRC32()
              c.update(data)
              (dOff, new String(data, Iso), c.getValue == crc)
            case None => (dOff, "", false)
          }
        }
      out += Entry(pos.toLong, localOff, dataOff, name, method.toLong,
        csize, usize, dosTime.toLong, dosDate.toLong, crcOk, body)
      pos += 46 + nameLen + extraLen + commentLen
    }
    out.result()
  }

  /** Explode `binaryFile` rows (`path`, `content`) into one row per
    * parsed member, the file's columns carried alongside. One narrow
    * per-file stage — no shuffle; the parse cost rides the scan. */
  def withZipEntries(files: DataFrame,
                     contentCol: String = "content"): DataFrame = {
    val working = Seq("__entries", "entry")
    val clash = files.columns.toSeq.intersect(working)
    require(clash.isEmpty, s"input columns ${clash.mkString(", ")} " +
      "collide with withZipEntries working names — rename them")
    val parse = udf((b: Array[Byte]) => entries(b))
    files
      .withColumn("__entries", explode(parse(col(contentCol))))
      .select((files.columns.filterNot(_ == contentCol).map(col) :+
        col("__entries.*")): _*)
  }

  /** Per-(extension, method, crc_ok) member census — the ADDITIVE
    * artifact of the ZIP axis (the [[Tar.entryCensus]] convention):
    * member count, compressed and uncompressed byte masses, all pure
    * sums, so archive-disjoint batches fold by [[mergeEntryCensus]]
    * into exactly the union census. One partial-aggregated exchange
    * over census-sized keys. */
  def entryCensus(entries: DataFrame): DataFrame =
    entries
      .groupBy(regexp_extract(col("name"), "\\.([^.]*)$", 1).as("ext"),
        col("method"), col("crc_ok"))
      .agg(count(lit(1)).as("n_entries"),
        sum(col("csize")).as("csize_sum"),
        sum(col("usize")).as("usize_sum"))

  /** Fold an archive-disjoint batch's census into a persisted one —
    * pure per-key addition (census-sized, never the corpus). */
  def mergeEntryCensus(persisted: DataFrame, batch: DataFrame): DataFrame =
    persisted.unionByName(batch)
      .groupBy(col("ext"), col("method"), col("crc_ok"))
      .agg(sum(col("n_entries")).as("n_entries"),
        sum(col("csize_sum")).as("csize_sum"),
        sum(col("usize_sum")).as("usize_sum"))
}
