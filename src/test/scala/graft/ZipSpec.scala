package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.source.{Zip, ZipFixtures}

/** ZIP walk unit coverage: spec-shaped round trips through the fixture
  * builder, the end-first parse order, real inflate of stored-block
  * deflate framing, CRC verification, and every fail-closed edge
  * (no EOCD, corrupt CRC, lying local header, truncated tail). */
class ZipSpec extends AnyFunSuite {
  private val Iso = java.nio.charset.StandardCharsets.ISO_8859_1

  private def member(name: String, method: Int, body: String) =
    ZipFixtures.Member(name, method, body.getBytes(Iso), 0x6a31L,
      ZipFixtures.DosDate)

  test("round trip: stored + deflated members, offsets and bodies") {
    val m1 = member("a.txt", 0, "hello zip world")
    val m2 = member("a.json", 8, """{"doc":1}""")
    val es = Zip.entries(ZipFixtures.archive(Seq(m1, m2)))
    assert(es.map(_.name) === Seq("a.txt", "a.json"))
    assert(es.map(_.body) === Seq("hello zip world", """{"doc":1}"""))
    assert(es.forall(_.crc_ok))
    assert(es.map(_.method) === Seq(0L, 8L))
    // layout arithmetic: local 0, then 30+5+15
    assert(es(0).local_off === 0L)
    assert(es(0).data_off === 30L + 5L)
    assert(es(1).local_off === 30L + 5L + 15L)
    assert(es(1).csize === 9L + 5L) // stored-block framing
    assert(es(1).usize === 9L)
    // central directory sits after both locals
    assert(es(0).cd_off === es(1).local_off + 30L + 6L + 14L)
  }

  test("dos fields survive the round trip") {
    val es = Zip.entries(ZipFixtures.archive(Seq(member("t.txt", 0, "x"))))
    assert(es.head.dos_time === 0x6a31L)
    assert(es.head.dos_date === ZipFixtures.DosDate)
  }

  test("not a zip / no EOCD fails closed to zero entries") {
    assert(Zip.entries(null) === Nil)
    assert(Zip.entries(Array[Byte]()) === Nil)
    assert(Zip.entries("PK only a local header".getBytes(Iso))
      === Nil)
  }

  test("corrupt data flips crc_ok but keeps the entry") {
    val bytes = ZipFixtures.archive(Seq(member("a.txt", 0, "abcdef")))
    val es0 = Zip.entries(bytes)
    assert(es0.head.crc_ok)
    bytes(es0.head.data_off.toInt) = 'X'.toByte // flip one payload byte
    val es = Zip.entries(bytes)
    assert(es.size === 1 && !es.head.crc_ok)
    assert(es.head.body === "Xbcdef") // decoded bytes still surface
  }

  test("lying local-header offset yields data_off -1, never a crash") {
    val bytes = ZipFixtures.archive(Seq(member("a.txt", 0, "abcdef")))
    val es0 = Zip.entries(bytes)
    // central-directory local_off field is at cd_off+42 (u32 LE)
    val p = es0.head.cd_off.toInt + 42
    bytes(p) = 0x77.toByte // point into the void
    val es = Zip.entries(bytes)
    assert(es.size === 1)
    assert(es.head.data_off === -1L && es.head.body === "" &&
      !es.head.crc_ok)
  }

  test("truncated deflate stream fails closed to empty body") {
    val m = member("a.json", 8, "0123456789")
    val bytes = ZipFixtures.archive(Seq(m))
    val es0 = Zip.entries(bytes)
    // shrink the recorded csize below the real stream length
    val p = es0.head.cd_off.toInt + 20
    bytes(p) = 0x03.toByte // csize 3 < 15
    val es = Zip.entries(bytes)
    assert(es.size === 1 && es.head.body === "" && !es.head.crc_ok)
  }

  test("deflateStored framing is real deflate") {
    val data = "the quick brown fox".getBytes(Iso)
    val framed = ZipFixtures.deflateStored(data)
    assert(framed.length === data.length + 5)
    val inf = new java.util.zip.Inflater(true)
    inf.setInput(framed)
    val out = new Array[Byte](data.length)
    assert(inf.inflate(out) === data.length)
    assert(out.toSeq === data.toSeq)
    inf.end()
  }

  test("census folds archive-disjoint batches into the union census") {
    val spark = TestSpark.spark
    import spark.implicits._
    def files(rows: (String, Array[Byte])*) =
      rows.toDF("path", "content")
    val a0 = ZipFixtures.archive(Seq(member("x.txt", 0, "one"),
      member("x.json", 8, """{"a":1}""")))
    val a1 = ZipFixtures.archive(Seq(member("y.txt", 0, "two words")))
    val full = Zip.entryCensus(
      Zip.withZipEntries(files("a0.zip" -> a0, "a1.zip" -> a1)))
    val folded = Zip.mergeEntryCensus(
      Zip.entryCensus(Zip.withZipEntries(files("a0.zip" -> a0))),
      Zip.entryCensus(Zip.withZipEntries(files("a1.zip" -> a1))))
    val key = Seq("ext", "method", "crc_ok")
    assert(folded.orderBy(key.head, key.tail: _*).collect().toSeq ===
      full.orderBy(key.head, key.tail: _*).collect().toSeq)
  }
}
