package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.source.{Pdf, PdfFixtures}

/** [[Pdf.objects]]/[[Pdf.textCensus]] over the fixture builder's bytes
  * plus the corrupt shapes the fixture never writes: truncated files,
  * junk, and a LYING xref (the check `xref_ok` exists for). */
class PdfSpec extends AnyFunSuite {

  private val Iso = java.nio.charset.StandardCharsets.ISO_8859_1
  private val onePage = PdfFixtures.pdfFile(3L,
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu")
  private val twoPage = PdfFixtures.pdfFile(5L,
    "one two three four five six seven eight nine ten eleven twelve " +
      "thirteen fourteen fifteen sixteen")

  test("object skeleton: spans, stream framing, xref agreement") {
    val objs = Pdf.objects(onePage.getBytes(Iso))
    assert(objs.map(_.obj_num) === Seq(1L, 2L, 3L, 4L))
    assert(objs.head.off === 9L) // after %PDF-1.4\n
    // objects tile the pre-xref region exactly
    assert(objs.map(_.obj_len).sum === onePage.indexOf("xref\n") - 9)
    objs.sliding(2).foreach { case Seq(a, b) =>
      assert(a.off + a.obj_len === b.off)
    }
    assert(objs.map(_.has_stream) === Seq(false, false, false, true))
    val c = objs.last
    assert(c.stream_len > 0)
    assert(onePage.substring(
      onePage.indexOf("stream\n", c.off.toInt) + 7).take(c.stream_len.toInt)
      .startsWith("BT (alpha beta gamma delta) Tj"))
    assert(objs.forall(o => o.xref_off === Some(o.off) && o.xref_ok))
  }

  test("two-page layout: six objects, two streams, text in page order") {
    val objs = Pdf.objects(twoPage.getBytes(Iso))
    assert(objs.map(_.obj_num) === (1L to 6L))
    assert(objs.count(_.has_stream) === 2)
    val (np, ntj, ntja, text) = Pdf.textCensus(twoPage.getBytes(Iso))
    assert((np, ntj, ntja) === ((2L, 2L, 2L)))
    assert(text === "one two three four five six seven eight " +
      "nine ten eleven twelve thirteen fourteen fifteen sixteen")
  }

  test("a lying xref flags xref_ok = false") {
    // shift every claimed offset by one: spans still parse, claims fail
    val lying = """(?m)^(\d{10}) 00000 n """.r
      .replaceAllIn(onePage, m =>
        f"${m.group(1).toLong + 1}%010d 00000 n ")
    val objs = Pdf.objects(lying.getBytes(Iso))
    assert(objs.nonEmpty)
    assert(objs.forall(!_.xref_ok))
  }

  test("FlateDecode streams inflate for text; corrupt flate fails closed") {
    def deflate(s: String): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(s.getBytes(Iso)); d.finish()
      val buf = new Array[Byte](8192)
      val n = d.deflate(buf); d.end()
      buf.take(n)
    }
    val content = "BT (compressed words here) Tj [(tail) -120 (end)] TJ ET"
    val enc = new String(deflate(content), Iso)
    def pdf(body: String) =
      ("%PDF-1.4\n1 0 obj\n<< /Type /Page >>\nendobj\n" +
        s"2 0 obj\n<< /Length ${body.length} /Filter /FlateDecode >>" +
        s"\nstream\n$body\nendstream\nendobj\n").getBytes(Iso)
    val (np, ntj, ntja, text) = Pdf.textCensus(pdf(enc))
    assert((np, ntj, ntja) === ((1L, 1L, 1L)))
    assert(text === "compressed words here tail end")
    // corrupt flate body: no text, no throw; page census still parses
    val bad = Pdf.textCensus(pdf(enc.drop(2)))
    assert(bad === ((1L, 0L, 0L, "")))
    // the uncompressed fixture path is untouched by the dict scan
    assert(Pdf.textCensus(onePage.getBytes(Iso))._4
      .startsWith("alpha beta gamma delta"))
  }

  test("fail closed: truncation, junk, missing xref") {
    val bytes = onePage.getBytes(Iso)
    // cut before the xref: objects parse, claims become None
    val cut = bytes.take(onePage.indexOf("xref\n"))
    val objs = Pdf.objects(cut)
    assert(objs.length === 4)
    assert(objs.forall(o => o.xref_off === None && !o.xref_ok))
    // cut mid-object: the unterminated tail object drops
    val mid = bytes.take(onePage.indexOf("4 0 obj") + 10)
    assert(Pdf.objects(mid).length === 3)
    assert(Pdf.objects("not a pdf".getBytes(Iso)) === Nil)
    assert(Pdf.objects(Array.empty[Byte]) === Nil)
    assert(Pdf.objects(null) === Nil)
    assert(Pdf.textCensus(null) === ((0L, 0L, 0L, "")))
  }
}
