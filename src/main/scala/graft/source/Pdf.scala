package graft.source

import java.util.zip.Inflater

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PDF header-level parsing — the second-biggest real corpus source
  * after HTML, handled with the container-honesty discipline of
  * [[graft.multimodal.Multimodal]] and [[Warc]]: parse the object
  * skeleton (`N G obj … endobj` spans, stream framing via the
  * `/Length` dict entry), replay the xref table against the actual
  * object offsets (a lying or shifted xref is the classic corrupt-PDF
  * failure), and extract text via the `Tj` / `TJ` show-text operators
  * from content streams — uncompressed or `/Filter /FlateDecode`
  * (zlib inflate, the dominant real-world encoding; a stream that
  * fails to inflate contributes no text — fail closed). The oracle
  * fixture writes uncompressed streams (deflate output bytes are not
  * SQL-replayable, stated); the flate path is spec-verified against
  * bytes this codebase compresses itself.
  *
  * Scale shape: one PDF = one binary cell = one narrow parse riding
  * the scan (the q132/q133/q193 pattern); only header-level rows and
  * extracted text continue into the plan, never the raw bytes.
  * Fail-closed: junk, truncated objects, and an unparsable xref
  * degrade to fewer rows / `xref_ok = false`, never a throw. */
object Pdf {

  /** One object-skeleton row. `xref_off` is the offset the file's OWN
    * xref table claims for this object (NULL when the xref is missing
    * or unparsable); `xref_ok` compares it to the parsed offset. */
  final case class PdfObject(obj_num: Long, off: Long, obj_len: Long,
                             has_stream: Boolean, stream_len: Long,
                             xref_off: Option[Long], xref_ok: Boolean)

  private val Iso = java.nio.charset.StandardCharsets.ISO_8859_1
  private val ObjRe = """(?m)^(\d+) (\d+) obj\b""".r
  private val LenRe = """/Length (\d+)""".r
  private val StartXrefRe = """startxref\s+(\d+)""".r
  private val TjRe = """\(([^)]*)\)\s*Tj""".r
  private val TjArrRe = """\[((?:[^\]])*)\]\s*TJ""".r
  private val StrRe = """\(([^)]*)\)""".r

  /** Parse the xref table at `off`: object number → claimed offset.
    * Supports the single-subsection classic form (`xref\n0 N\n` + N
    * 20-byte entries). Unparsable → empty (fail closed). */
  private def xrefTable(s: String, off: Long): Map[Long, Long] = {
    if (off < 0 || off >= s.length || !s.startsWith("xref", off.toInt))
      return Map.empty
    val header = """xref\s+(\d+) (\d+)\s*\n""".r
    header.findPrefixMatchOf(s.subSequence(off.toInt, s.length)) match {
      case None => Map.empty
      case Some(m) =>
        val first = m.group(1).toLong
        val n = m.group(2).toInt
        val base = off.toInt + m.end
        (0 until n).flatMap { i =>
          val e = base + i * 20
          if (e + 20 > s.length) None
          else {
            val entry = s.substring(e, e + 20)
            if (entry.charAt(17) == 'n')
              scala.util.Try(
                (first + i) -> entry.substring(0, 10).toLong).toOption
            else None
          }
        }.toMap
    }
  }

  /** Object-skeleton rows for one PDF's bytes. */
  def objects(bytes: Array[Byte]): Seq[PdfObject] = {
    if (bytes == null || bytes.length < 8) return Nil
    val s = new String(bytes, Iso)
    if (!s.startsWith("%PDF-")) return Nil
    val xref = StartXrefRe.findAllMatchIn(s).toSeq.lastOption
      .flatMap(m => scala.util.Try(m.group(1).toLong).toOption)
      .map(xrefTable(s, _)).getOrElse(Map.empty)
    ObjRe.findAllMatchIn(s).toSeq.flatMap { m =>
      val num = m.group(1).toLong
      val end = s.indexOf("endobj", m.start)
      if (end < 0) None
      else {
        val body = s.substring(m.start, end)
        val streamAt = body.indexOf("stream\n")
        val slen =
          if (streamAt < 0) 0L
          else LenRe.findFirstMatchIn(body)
            .flatMap(l => scala.util.Try(l.group(1).toLong).toOption)
            .getOrElse(0L)
        val claimed = xref.get(num)
        Some(PdfObject(num, m.start.toLong,
          (end + "endobj\n".length - m.start).toLong,
          streamAt >= 0, slen, claimed,
          claimed.contains(m.start.toLong)))
      }
    }
  }

  /** Inflate a zlib-wrapped FlateDecode stream body; None on any
    * corruption (fail closed — the stream contributes no text). */
  private def inflate(b: Array[Byte]): Option[Array[Byte]] =
    try {
      val inf = new Inflater()
      inf.setInput(b)
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n > 0) bos.write(buf, 0, n)
        else if (inf.needsInput() || inf.needsDictionary())
          throw new java.util.zip.DataFormatException("truncated")
      }
      inf.end()
      Some(bos.toByteArray)
    } catch {
      case _: java.util.zip.DataFormatException => None
    }

  /** Per-PDF text census: page count (`/Type /Page` objects), show-text
    * operator counts, and the text — every `(…) Tj` string plus every
    * string inside a `[…] TJ` array, in stream order, joined by one
    * space. `/Filter /FlateDecode` streams inflate first. Escape
    * sequences inside strings are out of scope (the fixture contract
    * is `[a-z0-9 ]` payloads, stated). */
  def textCensus(bytes: Array[Byte]): (Long, Long, Long, String) = {
    if (bytes == null) return (0L, 0L, 0L, "")
    val s = new String(bytes, Iso)
    if (!s.startsWith("%PDF-")) return (0L, 0L, 0L, "")
    val nPages = """/Type /Page\b""".r.findAllMatchIn(s).size.toLong
    val streams = """(?s)<<(.*?)>>\s*stream\n(.*?)\nendstream""".r
      .findAllMatchIn(s).map { m =>
        if (!m.group(1).contains("/Filter /FlateDecode")) m.group(2)
        else inflate(m.group(2).getBytes(Iso))
          .map(new String(_, Iso)).getOrElse("")
      }.toSeq
    val parts = streams.flatMap { body =>
      // interleave Tj and TJ hits in stream order
      val tj = TjRe.findAllMatchIn(body).map(m => (m.start, Seq(m.group(1))))
      val tja = TjArrRe.findAllMatchIn(body).map(m =>
        (m.start, StrRe.findAllMatchIn(m.group(1)).map(_.group(1)).toSeq))
      (tj ++ tja).toSeq.sortBy(_._1).flatMap(_._2)
    }
    val nTj = streams.map(b => TjRe.findAllMatchIn(b).size.toLong).sum
    val nTja = streams.map(b => TjArrRe.findAllMatchIn(b).size.toLong).sum
    (nPages, nTj, nTja, parts.mkString(" "))
  }

  /** Explode `binaryFile` rows into object-skeleton rows. */
  def withPdfObjects(files: DataFrame,
                     contentCol: String = "content"): DataFrame = {
    val parse = udf((b: Array[Byte]) => objects(b))
    files
      .withColumn("__objs", explode(parse(col(contentCol))))
      .select((files.columns.filterNot(_ == contentCol).map(col) :+
        col("__objs.*")): _*)
  }

  /** One text-census row per file (`n_pages`, `n_tj`, `n_tjarr`,
    * `pdf_text`). */
  def withPdfText(files: DataFrame,
                  contentCol: String = "content"): DataFrame = {
    val parse = udf((b: Array[Byte]) => textCensus(b))
    files
      .withColumn("__t", parse(col(contentCol)))
      .withColumn("n_pages", col("__t._1"))
      .withColumn("n_tj", col("__t._2"))
      .withColumn("n_tjarr", col("__t._3"))
      .withColumn("pdf_text", col("__t._4"))
      .drop("__t", contentCol)
  }
}
