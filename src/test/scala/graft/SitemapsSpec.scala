package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{RobotsTxt, Sitemaps}

/** Sitemap entry extraction (urlset / sitemapindex / junk, optional
  * tags, priority scaling) and the politeness-scheduled frontier
  * composition with the robots gate. */
class SitemapsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val urlset =
    """<?xml version="1.0"?><urlset xmlns="x">""" +
      "<url><loc>https://a.example/p/1</loc><lastmod>2024-01-02</lastmod>" +
      "<priority>0.8</priority></url>" +
      "<url><loc>https://a.example/p/2</loc>" +
      "<changefreq>daily</changefreq></url>" +
      "<url><loc>https://a.example/p/3</loc>" +
      "<priority>1.0</priority></url></urlset>"
  private val index =
    """<?xml version="1.0"?><sitemapindex xmlns="x">""" +
      "<sitemap><loc>https://a.example/s-1.xml</loc></sitemap>" +
      "<sitemap><loc>https://a.example/s-2.xml</loc></sitemap>" +
      "</sitemapindex>"

  test("parseEntries: kinds, optional tags, priority micro-scaling") {
    val df = Seq((1L, urlset), (2L, index), (3L, "not xml at all"))
      .toDF("doc_id", "body")
    val got = Sitemaps.parseEntries(df)
      .select("doc_id", "kind", "entry_idx", "loc", "lastmod",
        "changefreq", "priority_micro")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getString(3), r.getString(4), r.getString(5),
        if (r.isNullAt(6)) None else Some(r.getLong(6))))
      .sortBy(r => (r._1, r._3)).toSeq
    assert(got === Seq(
      (1L, "urlset", 0, "https://a.example/p/1", "2024-01-02", "",
        Some(800000L)),
      (1L, "urlset", 1, "https://a.example/p/2", "", "daily", None),
      (1L, "urlset", 2, "https://a.example/p/3", "", "",
        Some(1000000L)),
      (2L, "sitemapindex", 0, "https://a.example/s-1.xml", "", "", None),
      (2L, "sitemapindex", 1, "https://a.example/s-2.xml", "", "", None)))
    // junk: zero entries, never a throw
    assert(Sitemaps.parseEntries(df).filter(col("doc_id") === 3L)
      .count() === 0)
  }

  test("frontier: loc dedup, gate, priority order, crawl-delay spacing") {
    val maps = Seq(
      (1L, urlset),
      // duplicate loc p/1 discovered again with a lower priority: the
      // dedup keeps min id / max priority
      (2L, """<urlset xmlns="x"><url><loc>https://a.example/p/1</loc>""" +
        "<priority>0.1</priority></url>" +
        "<url><loc>https://a.example/private/x</loc>" +
        "<priority>0.9</priority></url></urlset>"))
      .toDF("doc_id", "body")
    val rules = RobotsTxt.parseRules(Seq(
      ("a.example", "User-agent: graftbot\nDisallow: /private\n" +
        "Crawl-delay: 5\n\nUser-agent: *\nDisallow: /\n"))
      .toDF("domain", "body"))
    val got = Sitemaps.frontier(Sitemaps.parseEntries(maps), rules,
        "graftbot")
      .select("seq", "loc", "priority_micro", "fetch_at_ms")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getLong(3)))
      .sortBy(_._1).toSeq
    // /private/x gated out; p/3 (1.0) first, p/1 (0.8 wins the dup
    // merge) second, p/2 (no priority -> last); 5 s crawl-delay spacing
    assert(got === Seq(
      (0L, "https://a.example/p/3", Some(1000000L), 0L),
      (1L, "https://a.example/p/1", Some(800000L), 5000L),
      (2L, "https://a.example/p/2", None, 10000L)))
  }
}
