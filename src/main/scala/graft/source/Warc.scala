package graft.source

import java.util.zip.Inflater

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WARC (Web ARChive, ISO 28500) container ingestion — the crawl
  * pipeline's front door: bytes-in, documents-out, the same
  * binary-content contract as the reference's S7 file fetch
  * (reference: monstache.go:1405-1433 reads file content alongside the
  * document; here the file IS the document stream).
  *
  * A WARC file is a concatenation of records, each
  * `WARC/1.0\r\n` + named headers + `\r\n\r\n` + `Content-Length`
  * bytes of block + `\r\n\r\n`. Common Crawl ships each record as its
  * own gzip member, concatenated ([[members]] detects the 1f8b magic
  * and walks members with a raw `Inflater`, reporting COMPRESSED
  * member spans — the byte ranges a ranged GET would fetch);
  * uncompressed files report record spans directly.
  *
  * Scale shape: the unit of parallelism is the WARC file (Common
  * Crawl's are ~1 GB) — `binaryFile` partitions by file, each file
  * parses sequentially and independently, and only the parsed members
  * (headers + extracted payload) continue into the plan; byte offsets
  * travel so a later decode stage can range-read the original object.
  * The whole-file in-memory decode below is a fixture-scale
  * simplification (stated): a production parser works a streaming
  * window, the member walk itself is already single-pass.
  *
  * Fail-closed parsing: a malformed record (missing `WARC/` magic,
  * unparsable or truncated Content-Length) stops the walk and returns
  * the members parsed so far — corrupt tails degrade to fewer
  * documents, never to misaligned garbage records. */
object Warc {

  /** One parsed record. `http_status`/payload fields are populated for
    * `response` records carrying `application/http` blocks; `mime` is
    * then the HTTP payload's Content-Type, otherwise the record's own.
    * `body` is the payload AFTER the HTTP header split (the HTML a
    * crawl pipeline extracts from); offsets/lengths are file-absolute
    * bytes (compressed spans for gzip members). */
  final case class Member(member_off: Long, member_len: Long,
                          warc_type: String, target_uri: String,
                          warc_date: String, content_length: Long,
                          http_status: Option[Int], mime: String,
                          body: String)

  private val Iso = java.nio.charset.StandardCharsets.ISO_8859_1

  /** Parse a WARC file's bytes into members (see class doc). */
  def members(bytes: Array[Byte]): Seq[Member] =
    if (bytes == null || bytes.length == 0) Nil
    else if (bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f &&
      (bytes(1) & 0xff) == 0x8b) gzipMembers(bytes)
    else parseStream(new String(bytes, Iso), 0L)

  /** Walk concatenated records in decoded text starting at text offset
    * 0; emitted offsets are `baseOff` + text position (ISO-8859-1 is
    * 1:1 byte↔char, so text positions ARE byte positions). */
  private def parseStream(s: String, baseOff: Long): Seq[Member] = {
    val out = Seq.newBuilder[Member]
    var pos = 0
    while (pos < s.length) {
      if (!s.startsWith("WARC/", pos)) return out.result()
      val hdrEnd = s.indexOf("\r\n\r\n", pos)
      if (hdrEnd < 0) return out.result()
      val h = s.substring(pos, hdrEnd).split("\r\n").iterator.drop(1)
        .flatMap { l =>
          val i = l.indexOf(':')
          if (i < 0) None
          else Some(l.substring(0, i).trim.toLowerCase ->
            l.substring(i + 1).trim)
        }.toMap
      val cl = h.get("content-length")
        .flatMap(v => scala.util.Try(v.toLong).toOption)
        .getOrElse(-1L)
      val cStart = hdrEnd + 4
      if (cl < 0 || cStart + cl > s.length) return out.result()
      val content = s.substring(cStart, cStart + cl.toInt)
      val wtype = h.getOrElse("warc-type", "")
      val ctype = h.getOrElse("content-type", "")
      val (status, mime, body) =
        if (wtype == "response" && ctype.startsWith("application/http"))
          splitHttp(content, ctype)
        else (None, ctype, content)
      // record trailer: two CRLF after the block (clamped at EOF)
      val mEnd = math.min(cStart + cl + 4, s.length.toLong)
      out += Member(baseOff + pos, mEnd - pos, wtype,
        h.getOrElse("warc-target-uri", ""), h.getOrElse("warc-date", ""),
        cl, status, mime, body)
      pos = mEnd.toInt
    }
    out.result()
  }

  /** Split an `application/http` block into (status, payload mime,
    * payload body). A block without the header/body separator or a
    * non-HTTP status line keeps the record's own content-type and the
    * whole block as body — fail closed, never throw. */
  private def splitHttp(content: String,
                        recordType: String): (Option[Int], String, String) = {
    val he = content.indexOf("\r\n\r\n")
    if (he < 0) return (None, recordType, content)
    val lines = content.substring(0, he).split("\r\n")
    val status = lines.headOption
      .filter(_.startsWith("HTTP/"))
      .flatMap(l => scala.util.Try(l.split(" ")(1).toInt).toOption)
    val mime = lines.iterator.drop(1)
      .map(_.split(":", 2))
      .collectFirst {
        case Array(k, v) if k.trim.equalsIgnoreCase("content-type") =>
          v.trim
      }
      .getOrElse(recordType)
    (status, mime, content.substring(he + 4))
  }

  /** Walk concatenated gzip members (the Common Crawl layout: one
    * record per member), reporting compressed spans. A member that
    * fails to inflate, or whose payload is not a single well-formed
    * record, stops the walk — same fail-closed tail discipline. */
  private def gzipMembers(bytes: Array[Byte]): Seq[Member] = {
    val out = Seq.newBuilder[Member]
    var pos = 0
    while (pos + 10 <= bytes.length && (bytes(pos) & 0xff) == 0x1f &&
      (bytes(pos + 1) & 0xff) == 0x8b) {
      val flg = bytes(pos + 3) & 0xff
      var p = pos + 10
      try {
        if ((flg & 4) != 0) { // FEXTRA
          val xlen = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
          p += 2 + xlen
        }
        if ((flg & 8) != 0) { while (bytes(p) != 0) p += 1; p += 1 }
        if ((flg & 16) != 0) { while (bytes(p) != 0) p += 1; p += 1 }
        if ((flg & 2) != 0) p += 2 // FHCRC
        val inf = new Inflater(true)
        inf.setInput(bytes, p, bytes.length - p)
        val bos = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        while (!inf.finished()) {
          val n = inf.inflate(buf)
          if (n > 0) bos.write(buf, 0, n)
          else if (inf.needsInput() || inf.needsDictionary())
            throw new java.util.zip.DataFormatException("truncated member")
        }
        val end = p + inf.getBytesRead.toInt + 8 // crc32 + isize trailer
        inf.end()
        if (end > bytes.length) return out.result()
        val inner = parseStream(new String(bos.toByteArray, Iso), 0L)
        inner match {
          case Seq(one) =>
            out += one.copy(member_off = pos.toLong,
              member_len = (end - pos).toLong)
          case _ => return out.result()
        }
        pos = end
      } catch {
        case _: java.util.zip.DataFormatException |
             _: ArrayIndexOutOfBoundsException => return out.result()
      }
    }
    out.result()
  }

  /** Per-(warc_type, http_status, mime) member census — the ADDITIVE
    * artifact of the WARC axis (the domain-census convention on
    * containers): member count, compressed/stored byte mass, and
    * payload byte mass, all pure sums, so file-disjoint crawl batches
    * fold by [[mergeMemberCensus]] into exactly the union census and a
    * rolling crawl never re-reads old segments. One partial-aggregated
    * exchange over census-sized keys. */
  def memberCensus(members: DataFrame): DataFrame =
    members.groupBy(col("warc_type"), col("http_status"), col("mime"))
      .agg(count(lit(1)).as("n_members"),
        sum(col("member_len")).as("bytes_sum"),
        sum(col("content_length")).as("cl_sum"))

  /** Fold a file-disjoint batch's census into a persisted one — pure
    * per-key addition (census-sized, never the corpus). */
  def mergeMemberCensus(persisted: DataFrame, batch: DataFrame): DataFrame =
    persisted.unionByName(batch)
      .groupBy(col("warc_type"), col("http_status"), col("mime"))
      .agg(sum(col("n_members")).as("n_members"),
        sum(col("bytes_sum")).as("bytes_sum"),
        sum(col("cl_sum")).as("cl_sum"))

  /** Explode `binaryFile` rows (`path`, `content`) into one row per
    * parsed member, the file's columns carried alongside. One narrow
    * per-file stage — no shuffle; the parse cost rides the scan. */
  def withWarcMembers(files: DataFrame,
                      contentCol: String = "content"): DataFrame = {
    val working = Seq("__members", "member")
    val clash = files.columns.toSeq.intersect(working)
    require(clash.isEmpty, s"input columns ${clash.mkString(", ")} " +
      "collide with withWarcMembers working names — rename them")
    val parse = udf((b: Array[Byte]) => members(b))
    files
      .withColumn("__members", explode(parse(col(contentCol))))
      .select((files.columns.filterNot(_ == contentCol).map(col) :+
        col("__members.*")): _*)
  }
}
