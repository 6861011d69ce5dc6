package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.source.{Warc, WarcFixtures}

/** [[Warc.members]]' walk over both container layouts (uncompressed
  * record stream, one-gzip-member-per-record), the HTTP block split,
  * and the fail-closed tail discipline. Fixture strings come from
  * [[WarcFixtures]] — the same builders that write the q222/q223 files,
  * so the spec exercises the exact byte shapes the oracle replays. */
class WarcSpec extends AnyFunSuite {

  private val Iso = java.nio.charset.StandardCharsets.ISO_8859_1

  private def gz(s: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(s.getBytes(Iso)); g.close()
    bos.toByteArray
  }

  private val recA = WarcFixtures.record(2L, "src2",
    "alpha beta gamma delta epsilon zeta eta theta iota kappa")
  private val recB = WarcFixtures.record(7L, "src7", "short text here")
  private val recJson = WarcFixtures.record(12L, "src12", "ignored words")
  private val infoRec = WarcFixtures.infoRecord(0L)

  test("uncompressed stream: offsets, headers, http split") {
    val bytes = (infoRec + recA + recB).getBytes(Iso)
    val ms = Warc.members(bytes)
    assert(ms.length === 3)
    val Seq(i, a, b) = ms
    assert(i.warc_type === "warcinfo")
    assert(i.member_off === 0L && i.member_len === infoRec.length)
    assert(i.mime === "application/warc-fields")
    assert(i.http_status === None)
    assert(i.body === WarcFixtures.InfoPayload)
    assert(a.warc_type === "response")
    assert(a.member_off === infoRec.length && a.member_len === recA.length)
    assert(a.target_uri === "https://src2-2.com/d/2")
    assert(a.warc_date === "2024-01-03T00:00:00Z")
    assert(a.http_status === Some(200))
    assert(a.mime === "text/html; charset=utf-8")
    assert(a.body.startsWith("<html><head><title>doc 2</title>"))
    assert(a.body.contains("<p>alpha beta gamma delta epsilon zeta eta " +
      "theta.</p><p>iota kappa.</p>"))
    // doc 7: the 404 arm
    assert(b.member_off === infoRec.length + recA.length)
    assert(b.http_status === Some(404))
    assert(b.body === WarcFixtures.NotFoundPage)
  }

  test("json arm carries the payload mime, not the record's") {
    val ms = Warc.members(recJson.getBytes(Iso))
    assert(ms.length === 1)
    assert(ms.head.http_status === Some(200))
    assert(ms.head.mime === "application/json")
    assert(ms.head.body === """{"doc":12}""")
  }

  test("gzip members: compressed spans, one record per member") {
    val ga = gz(infoRec); val gb = gz(recA); val gc = gz(recB)
    val ms = Warc.members(ga ++ gb ++ gc)
    assert(ms.length === 3)
    assert(ms(0).member_off === 0L && ms(0).member_len === ga.length)
    assert(ms(1).member_off === ga.length &&
      ms(1).member_len === gb.length)
    assert(ms(2).member_off === ga.length + gb.length &&
      ms(2).member_len === gc.length)
    // spans tile the file exactly — the ranged-GET contract
    assert(ms.map(_.member_len).sum === (ga ++ gb ++ gc).length)
    assert(ms(1).target_uri === "https://src2-2.com/d/2")
    assert(ms(1).http_status === Some(200))
  }

  test("fail closed: truncated tails and junk stop the walk, never throw") {
    val full = (infoRec + recA).getBytes(Iso)
    // chop mid-second-record: only the info record survives
    val ms = Warc.members(full.dropRight(recA.length / 2))
    assert(ms.length === 1 && ms.head.warc_type === "warcinfo")
    assert(Warc.members("HTTP/1.1 200 OK\r\n\r\n".getBytes(Iso)) === Nil)
    assert(Warc.members(Array.empty[Byte]) === Nil)
    assert(Warc.members(null) === Nil)
    // truncated gzip member: parsed members before it survive
    val g = gz(infoRec) ++ gz(recA).dropRight(6)
    val gm = Warc.members(g)
    assert(gm.length === 1 && gm.head.warc_type === "warcinfo")
  }
}
