package graft.source

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TAR (POSIX ustar) container ingestion — the shard format of
  * WebDataset-style multimodal training corpora (a sample's members,
  * `<key>.img` / `<key>.json` / `<key>.txt`, sit adjacent in one tar;
  * shards stream whole, no random access needed). The same
  * bytes-in/documents-out contract as [[Warc]] and the reference's S7
  * file fetch (reference: monstache.go:1405-1433): the container IS
  * the document stream.
  *
  * A tar archive is a sequence of 512-byte headers, each followed by
  * the member's data NUL-padded to a 512 boundary, terminated by a
  * zero block. Header fields are ASCII: NUL-padded name, octal
  * size/mtime/chksum, a one-byte typeflag, `ustar` magic. The
  * checksum is the byte sum of the header with the chksum field
  * blanked to spaces — verified per entry and carried as a flag so a
  * census can quarantine corrupt members instead of silently
  * ingesting them.
  *
  * Scale shape: the unit of parallelism is the shard file (WebDataset
  * shards are ~1 GB by construction) — `binaryFile` partitions by
  * file, each shard parses sequentially and independently in one
  * narrow pass riding the scan; byte offsets travel so a decode stage
  * can range-read members from the original object. The whole-file
  * in-memory walk below is a fixture-scale simplification (stated);
  * the entry walk itself is already single-pass.
  *
  * Fail-closed parsing: a structurally broken header (no `ustar`
  * magic, unparsable size, truncated data) stops the walk and returns
  * the entries parsed so far — corrupt tails degrade to fewer
  * samples, never to misaligned garbage entries. A checksum mismatch
  * on an otherwise well-formed header does NOT stop the walk (framing
  * is intact); it surfaces as `chksum_ok = false`. */
object Tar {

  /** One parsed entry. `entry_off` is the header's file-absolute byte
    * offset, `data_off = entry_off + 512`; `body` is the member data
    * (ISO-8859-1, 1:1 byte↔char) for regular files, empty otherwise. */
  final case class Entry(entry_off: Long, data_off: Long, name: String,
                         size: Long, mtime: Long, typeflag: String,
                         chksum_ok: Boolean, body: String)

  private val Iso = java.nio.charset.StandardCharsets.ISO_8859_1

  /** Trim a NUL/space-padded ASCII field. */
  private def field(b: Array[Byte], off: Int, len: Int): String = {
    val end = {
      var i = off
      while (i < off + len && b(i) != 0) i += 1
      i
    }
    new String(b, off, end - off, Iso).trim
  }

  /** Parse an octal numeric field; None on empty/garbage (fail closed). */
  private def octal(b: Array[Byte], off: Int, len: Int): Option[Long] = {
    val s = field(b, off, len)
    if (s.isEmpty || !s.forall(c => c >= '0' && c <= '7')) None
    else scala.util.Try(java.lang.Long.parseLong(s, 8)).toOption
  }

  /** Parse a tar archive's bytes into entries (see class doc). */
  def entries(bytes: Array[Byte]): Seq[Entry] = {
    if (bytes == null) return Nil
    val out = Seq.newBuilder[Entry]
    var pos = 0
    while (pos + 512 <= bytes.length) {
      var allZero = true
      var i = pos
      while (allZero && i < pos + 512) { if (bytes(i) != 0) allZero = false; i += 1 }
      if (allZero) return out.result() // end-of-archive marker
      if (!field(bytes, pos + 257, 6).startsWith("ustar"))
        return out.result()
      val sizeOpt = octal(bytes, pos + 124, 12)
      if (sizeOpt.isEmpty) return out.result()
      val size = sizeOpt.get
      val padded = ((size + 511) / 512) * 512
      if (pos + 512 + size > bytes.length) return out.result() // truncated
      // checksum: header byte sum with the chksum field (148..155)
      // read as spaces; stored value is octal in that field
      var sum = 0L
      i = pos
      while (i < pos + 512) {
        sum += (if (i - pos >= 148 && i - pos < 156) 0x20
                else bytes(i) & 0xff)
        i += 1
      }
      val ok = octal(bytes, pos + 148, 8).contains(sum)
      val rawName = field(bytes, pos, 100)
      val prefix = field(bytes, pos + 345, 155)
      val name = if (prefix.isEmpty) rawName else s"$prefix/$rawName"
      val tfByte = bytes(pos + 156)
      val typeflag =
        if (tfByte == 0) "0" else new String(Array(tfByte), Iso)
      val regular = typeflag == "0"
      val body =
        if (regular && size > 0)
          new String(bytes, pos + 512, size.toInt, Iso)
        else ""
      out += Entry(pos.toLong, pos + 512L, name, size,
        octal(bytes, pos + 136, 12).getOrElse(0L), typeflag, ok, body)
      pos += 512 + padded.toInt
    }
    out.result()
  }

  /** Explode `binaryFile` rows (`path`, `content`) into one row per
    * parsed entry, the file's columns carried alongside. One narrow
    * per-file stage — no shuffle; the parse cost rides the scan. */
  def withTarEntries(files: DataFrame,
                     contentCol: String = "content"): DataFrame = {
    val working = Seq("__entries", "entry")
    val clash = files.columns.toSeq.intersect(working)
    require(clash.isEmpty, s"input columns ${clash.mkString(", ")} " +
      "collide with withTarEntries working names — rename them")
    val parse = udf((b: Array[Byte]) => entries(b))
    files
      .withColumn("__entries", explode(parse(col(contentCol))))
      .select((files.columns.filterNot(_ == contentCol).map(col) :+
        col("__entries.*")): _*)
  }

  /** Per-(extension, typeflag, chksum_ok) entry census — the ADDITIVE
    * artifact of the TAR axis (the [[Warc.memberCensus]] convention on
    * shards): entry count, stored byte mass (header + padded data),
    * and declared data mass, all pure sums, so shard-disjoint batches
    * fold by [[mergeEntryCensus]] into exactly the union census and a
    * rolling shard drop never re-reads old shards. One
    * partial-aggregated exchange over census-sized keys. */
  def entryCensus(entries: DataFrame): DataFrame =
    entries
      .groupBy(regexp_extract(col("name"), "\\.([^.]*)$", 1).as("ext"),
        col("typeflag"), col("chksum_ok"))
      .agg(count(lit(1)).as("n_entries"),
        sum(expr("512 + ((size + 511) DIV 512) * 512")).as("stored_sum"),
        sum(col("size")).as("size_sum"))

  /** Fold a shard-disjoint batch's census into a persisted one — pure
    * per-key addition (census-sized, never the corpus). */
  def mergeEntryCensus(persisted: DataFrame, batch: DataFrame): DataFrame =
    persisted.unionByName(batch)
      .groupBy(col("ext"), col("typeflag"), col("chksum_ok"))
      .agg(sum(col("n_entries")).as("n_entries"),
        sum(col("stored_sum")).as("stored_sum"),
        sum(col("size_sum")).as("size_sum"))

  /** WebDataset sample assembly: group entries by sample key (the
    * member name up to its LAST dot — WebDataset's convention; dots
    * inside the key survive) and report the sample's member set,
    * byte mass, and completeness against `requiredExts`.
    *
    * Scale shape: a sample's members are adjacent within one shard by
    * construction, so the groupBy key is (shard path, key) and AQE's
    * local hash aggregate does nearly all the work map-side; the
    * exchange moves sample-census rows (key + counters), never member
    * bodies. Output is sample-count-sized, not byte-sized. */
  def webdatasetSamples(entries: DataFrame,
                        requiredExts: Seq[String],
                        pathCol: String = "path"): DataFrame = {
    val working = Seq("__key", "__ext")
    val clash = entries.columns.toSeq.intersect(working)
    require(clash.isEmpty, s"input columns ${clash.mkString(", ")} " +
      "collide with webdatasetSamples working names — rename them")
    entries
      .withColumn("__key", regexp_extract(col("name"), "^(.*)\\.[^.]*$", 1))
      .withColumn("__ext", regexp_extract(col("name"), "\\.([^.]*)$", 1))
      .groupBy(col(pathCol), col("__key").as("key"))
      .agg(
        count(lit(1)).as("n_members"),
        array_join(array_sort(collect_list(col("__ext"))), ",").as("exts"),
        sum(col("size")).as("bytes_sum"),
        min(col("chksum_ok")).as("all_chksum_ok"))
      .withColumn("complete",
        col("exts") === lit(requiredExts.sorted.mkString(",")))
  }
}
