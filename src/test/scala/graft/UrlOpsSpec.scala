package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.UrlOps

/** URL parsing + public-suffix-list reduction: every PSL rule type
  * (plain, multi-label, wildcard, exception, no-match default) and the
  * domain gate's blocklist/cap/NULL-pass-through semantics. */
class UrlOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def parts(url: String): (String, String, String, String) = {
    import spark.implicits._
    val r = UrlOps.withUrlParts(Seq((1L, url)).toDF("doc_id", "url")).head()
    (r.getAs[String]("scheme"), r.getAs[String]("host"),
      r.getAs[String]("path"), r.getAs[String]("query"))
  }

  private def dom(host: String): (String, Option[String]) = {
    import spark.implicits._
    val r = UrlOps.withDomain(Seq((1L, host)).toDF("doc_id", "host")).head()
    (r.getAs[String]("public_suffix"),
      Option(r.getAs[String]("registered_domain")))
  }

  test("url parts: scheme/host/path/query, port and fragment excluded") {
    assert(parts("https://www.example.com/a/b?x=1&y=2#frag") ===
      (("https", "www.example.com", "/a/b", "x=1&y=2")))
    assert(parts("http://example.org:8080/p") ===
      (("http", "example.org", "/p", "")))
    assert(parts("https://example.io") === (("https", "example.io", "", "")))
  }

  test("userinfo strips from host; IPv6 literals are kept whole") {
    // without the strip every userinfo URL collapses onto host 'alice'
    assert(parts("https://alice:pw@example.com/a") ===
      (("https", "example.com", "/a", "")))
    assert(parts("https://bob@example.org:8080/p?q=1") ===
      (("https", "example.org", "/p", "q=1")))
    // an @ in path/query is NOT userinfo
    assert(parts("https://example.com/u/@handle") ===
      (("https", "example.com", "/u/@handle", "")))
    assert(parts("https://[2001:db8::1]:8080/x") ===
      (("https", "[2001:db8::1]", "/x", "")))
    // IP literals have no public suffix — PSL fails closed to NULLs
    import spark.implicits._
    val r = UrlOps.withDomain(
      Seq((1L, "[2001:db8::1]")).toDF("doc_id", "host")).head()
    assert(r.isNullAt(r.fieldIndex("public_suffix")))
    assert(r.isNullAt(r.fieldIndex("registered_domain")))
  }

  test("canonical url: userinfo collapses, IPv6 fails closed to NULL") {
    import spark.implicits._
    def canon(url: String): Option[String] = {
      val r = UrlOps.withCanonicalUrl(
        Seq((1L, url)).toDF("doc_id", "url")).head()
      Option(r.getAs[String]("canonical_url"))
    }
    assert(canon("https://alice:pw@Example.com/a/") ===
      Some("https://example.com/a"))
    assert(canon("https://Example.com/a") === Some("https://example.com/a"))
    // bracketed IPv6: the colon-laden literal defeats the port split —
    // NULL key = the no-dedup path, never a wrong shared key
    assert(canon("https://[2001:db8::1]/a") === None)
    assert(canon("https://[2001:db8::1]:8080/a?x=1") === None)
  }

  test("plain rules: longest match wins (co.uk over uk)") {
    assert(dom("www.example.co.uk") ===
      (("co.uk", Some("example.co.uk"))))
    assert(dom("example.com") === (("com", Some("example.com"))))
  }

  test("hosted-platform suffix: github.io beats io") {
    assert(dom("github.io") === (("github.io", None)))
    assert(dom("user.github.io") ===
      (("github.io", Some("user.github.io"))))
    assert(dom("www.user.github.io") ===
      (("github.io", Some("user.github.io"))))
  }

  test("wildcard *.ck: every x.ck is itself a public suffix") {
    assert(dom("site.ck") === (("site.ck", None)))
    assert(dom("shop.site.ck") === (("site.ck", Some("shop.site.ck"))))
  }

  test("exception !www.ck beats the wildcard") {
    assert(dom("www.ck") === (("ck", Some("www.ck"))))
    // deeper hosts still resolve through the exception: ps stays ck
    assert(dom("sub.www.ck") === (("ck", Some("www.ck"))))
  }

  test("no rule match defaults to the bare TLD (the * rule)") {
    assert(dom("example.dev") === (("dev", Some("example.dev"))))
    assert(dom("a.b.example.dev") === (("dev", Some("example.dev"))))
  }

  test("a bare public suffix has no registrable domain") {
    assert(dom("com") === (("com", None)))
    assert(dom("co.uk") === (("co.uk", None)))
  }

  test("domain gate: blocklist, per-domain cap, NULL pass-through") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("a.com")), (2L, Some("a.com")), (3L, Some("a.com")),
      (4L, Some("bad.com")), (5L, Option.empty[String]),
      (6L, Option.empty[String])).toDF("doc_id", "registered_domain")
    val out = UrlOps.domainGate(df, Seq("bad.com"), maxPerDomain = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Boolean]("blocked"), r.getAs[Boolean]("kept")))).toMap
    assert(out === Map(
      1L -> ((false, true)), 2L -> ((false, true)),
      3L -> ((false, false)), // over the cap
      4L -> ((true, false)), // blocklisted
      5L -> ((false, true)), 6L -> ((false, true)))) // NULL: ungated
  }

  test("canonicalization: case, ports, tracking, slash, fragment") {
    import spark.implicits._
    def canon(url: String): String =
      UrlOps.withCanonicalUrl(Seq((1L, url)).toDF("doc_id", "url"))
        .select("canonical_url").head().getString(0)
    // the noisy-twin class collapses onto the clean form
    assert(canon("https://WWW.Example.COM:443/a/b/?utm_source=f&gclid=g#x")
      === "https://www.example.com/a/b")
    assert(canon("https://www.example.com/a/b") ===
      "https://www.example.com/a/b")
    // non-default port survives; params sort; non-tracking params stay
    assert(canon("https://h.io:8443/p?b=2&a=1&ref=r") ===
      "https://h.io:8443/p?a=1&b=2")
    // bare host normalizes to '/'; http:80 drops
    assert(canon("http://h.io:80") === "http://h.io/")
    // 'utm' without the underscore is NOT a tracking prefix match
    assert(canon("https://h.io/p?utm=x") === "https://h.io/p?utm=x")
    // unparseable → NULL
    assert(UrlOps.withCanonicalUrl(
        Seq((1L, "not a url")).toDF("doc_id", "url"))
      .select("canonical_url").head().isNullAt(0))
  }

  test("domain census folds additively; verdict gates blocklist + share") {
    import spark.implicits._
    def docs(rows: (Long, Option[String])*) =
      rows.toDF("doc_id", "registered_domain")
    val all = docs((1L, Some("a.com")), (2L, Some("a.com")),
      (3L, Some("a.com")), (4L, Some("b.com")), (5L, Option.empty[String]))
    val folded = UrlOps.mergeDomainCensus(
      UrlOps.domainCensus(all.filter($"doc_id" <= 2)),
      UrlOps.domainCensus(all.filter($"doc_id" > 2)))
    val full = UrlOps.domainCensus(all)
    assert(folded.collect().map(_.toSeq).toSet ===
      full.collect().map(_.toSeq).toSet)
    val v = UrlOps.withDomainVerdict(folded, Seq("b.com"),
        maxShareMicro = 500000L)
      .collect().map(r => Option(r.getAs[String]("registered_domain")) ->
        ((r.getAs[Long]("share_micro"), r.getAs[Boolean]("blocked"),
          r.getAs[Boolean]("kept")))).toMap
    assert(v(Some("a.com")) === ((600000L, false, false))) // over share
    assert(v(Some("b.com")) === ((200000L, true, false))) // blocklisted
    assert(v(None) === ((200000L, false, true))) // NULL: share-gated only
  }

  test("output-name clashes fail loudly") {
    import spark.implicits._
    val df = Seq((1L, "u", "h")).toDF("doc_id", "url", "host")
    val e = intercept[IllegalArgumentException](UrlOps.withUrlParts(df))
    assert(e.getMessage.contains("collide"))
  }
}
