package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.RobotsTxt

/** REP parsing + precedence: group boundaries, comment/case handling,
  * UA election, longest-match, allow-beats-disallow, wildcard/anchor
  * semantics, literal-escaping of regex metacharacters, default-allow. */
class RobotsTxtSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def rules(body: String) = {
    import spark.implicits._
    RobotsTxt.parseRules(Seq(("d.example", body)).toDF("domain", "body"))
  }

  private def gate(body: String, path: String,
                   ua: String = "graftbot"): (Boolean, Option[String],
      Option[String], Option[Long]) = {
    import spark.implicits._
    val urls = Seq((1L, "d.example", path)).toDF("doc_id", "domain", "path")
    val r = RobotsTxt.gateUrls(urls, rules(body), ua).head()
    (r.getAs[Boolean]("allowed"),
      Option(r.getAs[String]("matched_directive")),
      Option(r.getAs[String]("matched_pattern")),
      if (r.isNullAt(r.fieldIndex("crawl_delay"))) None
      else Some(r.getAs[Long]("crawl_delay")))
  }

  test("parse: groups, multi-UA fan-out, comments, pre-group lines") {
    val got = rules(
      "Disallow: /ignored\n# header\nUser-Agent: a\nUser-agent: b\n" +
        "Disallow: /x # inline\n\nUser-agent: *\nAllow: /y\n")
      .select("group_id", "ua", "directive", "value")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3))).toSet
    assert(got === Set(
      (1L, "a", "disallow", "/x"), (1L, "b", "disallow", "/x"),
      (2L, "*", "allow", "/y")))
  }

  test("gate: longest match wins; allow beats disallow on ties") {
    val body = "User-agent: *\nDisallow: /p\nAllow: /p/1\nDisallow: /p/1\n"
    assert(gate(body, "/p/1x")._1 === true)   // tie at /p/1 -> allow
    assert(gate(body, "/p/9")._1 === false)   // only /p matches
    assert(gate(body, "/")._1 === true)       // no match -> allow
  }

  test("gate: wildcard + anchor semantics") {
    val body = "User-agent: *\nDisallow: /*/9$\nAllow: /\n"
    assert(gate(body, "/p/9") === ((false, Some("disallow"),
      Some("/*/9$"), None)))
    assert(gate(body, "/p/19")._1 === true) // anchor: no suffix match
    assert(gate(body, "/p/9/x")._1 === true)
  }

  test("gate: most specific UA group shadows *, crawl-delay carried") {
    val body = "User-agent: graftbot\nDisallow: /private\n" +
      "Crawl-delay: 5\n\nUser-agent: *\nDisallow: /\n"
    assert(gate(body, "/public") === ((true, None, None, Some(5L))))
    assert(gate(body, "/private/x")._1 === false)
    // a crawler the specific group doesn't cover falls to *
    assert(gate(body, "/public", ua = "otherbot")._1 === false)
  }

  test("regex metacharacters in patterns match literally") {
    val body = "User-agent: *\nDisallow: /a.b+c(d)\n"
    assert(gate(body, "/a.b+c(d)/x")._1 === false)
    // '.' must NOT match any char, '+' not repeat
    assert(gate(body, "/aXb+c(d)/x")._1 === true)
    assert(gate(body, "/a.bbc(d)")._1 === true)
  }

  test("no policy or no matching group = default allow") {
    assert(gate("", "/anything") === ((true, None, None, None)))
    val other = "User-agent: otherbot\nDisallow: /\n"
    assert(gate(other, "/x") === ((true, None, None, None)))
  }

  test("sitemap discovery: global lines, any case, comments stripped") {
    import spark.implicits._
    val body = "User-agent: *\nDisallow: /x\n" +
      "Sitemap: https://d.example/a.xml\n" +
      "SITEMAP: https://d.example/b.xml # inline\n" +
      "sitemap:https://d.example/c.xml\n" +
      "# Sitemap: https://d.example/commented.xml\n" +
      "Sitemap:\n" // empty value drops
    val out = RobotsTxt.sitemapUrls(
      Seq(("d.example", body)).toDF("domain", "body"))
      .orderBy("pos").collect()
      .map(r => (r.getAs[Int]("pos"), r.getAs[String]("sitemap_url")))
    assert(out.toSeq === Seq(2 -> "https://d.example/a.xml",
      3 -> "https://d.example/b.xml", 4 -> "https://d.example/c.xml"))
  }

  test("sitemap discovery on a null/empty body is empty, not a crash") {
    import spark.implicits._
    assert(RobotsTxt.sitemapUrls(
      Seq(("d.example", null: String), ("e.example", ""))
        .toDF("domain", "body")).count() === 0L)
  }
}
