package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Extract

/** HTML → text extraction: chrome stripping, title capture, heading
  * retention, link-density scoring, entity decode order, and the
  * malformed/nested/attribute-laden cases the class doc states degrade
  * safely. */
class ExtractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def one(html: String): org.apache.spark.sql.Row = {
    import spark.implicits._
    Extract.htmlExtract(Seq((1L, html)).toDF("doc_id", "html"))
      .select("title", "n_blocks", "n_kept", "text").head()
  }

  test("title captured, script/style/comment stripped, prose kept") {
    val r = one("<html><head><title>My  Page</title>" +
      "<style>.x{color:red}</style></head><body>" +
      "<script>var a = 1; if (a<2) a++;</script>" +
      "<!-- tracking comment -->" +
      "<p>the quick brown fox jumps over the lazy dog.</p>" +
      "</body></html>")
    assert(r.getAs[String]("title") === "My Page")
    assert(r.getAs[Long]("n_kept") === 1L)
    assert(r.getAs[String]("text") ===
      "the quick brown fox jumps over the lazy dog.")
  }

  test("headings survive below minWords; short prose does not") {
    val r = one("<body><h2 class=\"t\">tiny heading</h2>" +
      "<p>too short</p>" +
      "<p>this paragraph carries enough words to pass.</p></body>")
    assert(r.getAs[Long]("n_kept") === 2L)
    assert(r.getAs[String]("text") ===
      "tiny heading\nthis paragraph carries enough words to pass.")
  }

  test("link farms drop on density even past the word gate") {
    // 9 words, but ~2/3 of the chars are anchor text
    val farm = "<div>visit <a href=\"/a\">the first great page</a> and " +
      "<a href=\"/b\">the second better page</a></div>"
    val r = one(s"<body>$farm</body>")
    assert(r.getAs[Long]("n_kept") === 0L)
    // the same sentence without anchors survives
    val r2 = one("<body><div>visit the first great page and " +
      "the second better page</div></body>")
    assert(r2.getAs[Long]("n_kept") === 1L)
  }

  test("an inline link inside real prose survives the density gate") {
    val r = one("<body><p>read the full engine guide at " +
      "<a href=\"/docs\">docs</a> right now today.</p></body>")
    assert(r.getAs[Long]("n_kept") === 1L)
    assert(r.getAs[String]("text") ===
      "read the full engine guide at docs right now today.")
  }

  test("entities decode AFTER tag strip — &lt;i&gt; stays literal") {
    val r = one("<body><p>tom &amp; jerry say &lt;i&gt; is &quot;safe&quot; " +
      "here&nbsp;now</p></body>")
    assert(r.getAs[String]("text") ===
      "tom & jerry say <i> is \"safe\" here now")
  }

  test("malformed markup degrades safely: unclosed + nested + attrs") {
    val r = one("<body><div data-x=\"1\" class><div><div>" +
      "deeply nested text still extracts just fine here" +
      "</div></div>" +
      "<p>broken <b>bold run of five words minimum")
    assert(r.getAs[Long]("n_kept") === 2L)
    assert(r.getAs[String]("text") ===
      "deeply nested text still extracts just fine here\n" +
        "broken bold run of five words minimum")
  }

  test("null html reads as an empty page, not a crash") {
    import spark.implicits._
    val df = Seq((1L, Option.empty[String])).toDF("doc_id", "html")
    val r = Extract.htmlExtract(df)
      .select("title", "n_blocks", "n_kept", "text").head()
    assert(r.getAs[String]("title") === "")
    assert(r.getAs[Long]("n_kept") === 0L)
    assert(r.getAs[String]("text") === "")
  }

  test("page directives: robots + canonical extraction, absent = empty") {
    import spark.implicits._
    def dirs(html: String) = {
      val r = Extract.withPageDirectives(
        Seq((1L, html)).toDF("doc_id", "html")).head()
      (r.getAs[String]("meta_robots"), r.getAs[Boolean]("noindex"),
        r.getAs[String]("canonical_href"))
    }
    assert(dirs("<head><meta name=\"robots\" content=\"NOINDEX, nofollow\">" +
      "<link rel=\"canonical\" href=\"https://a.com/p\"></head>") ===
      (("NOINDEX, nofollow", true, "https://a.com/p")))
    assert(dirs("<meta name=\"robots\" content=\"index, follow\">") ===
      (("index, follow", false, "")))
    assert(dirs("<p>no head at all</p>") === (("", false, "")))
    // other meta tags never match; extra attributes before name are fine
    assert(dirs("<meta charset=\"utf8\"><meta data-x=\"1\" " +
      "name=\"robots\" content=\"noindex\">") ===
      (("noindex", true, "")))
  }

  test("page directives fail closed on markup variation: quoting + order") {
    import spark.implicits._
    def dirs(html: String) = {
      val r = Extract.withPageDirectives(
        Seq((1L, html)).toDF("doc_id", "html")).head()
      (r.getAs[String]("meta_robots"), r.getAs[Boolean]("noindex"),
        r.getAs[String]("canonical_href"))
    }
    // reversed attribute order — the must-not-enter gate still fires
    assert(dirs("<meta content=\"noindex\" name=\"robots\">") ===
      (("noindex", true, "")))
    // single quotes / no quotes on either attribute
    assert(dirs("<meta name='robots' content='noindex, nofollow'>") ===
      (("noindex, nofollow", true, "")))
    assert(dirs("<meta name=robots content=noindex>") ===
      (("noindex", true, "")))
    assert(dirs("<link href='https://a.com/p' rel='canonical'>") ===
      (("", false, "https://a.com/p")))
    assert(dirs("<link rel=canonical href=https://a.com/p>") ===
      (("", false, "https://a.com/p")))
    // the \b boundary: name=robotsx is NOT the robots tag
    assert(dirs("<meta name=\"robotsx\" content=\"noindex\">") ===
      (("", false, "")))
  }

  test("working/output name clashes fail loudly") {
    import spark.implicits._
    val df = Seq((1L, "<p>x</p>", "t")).toDF("doc_id", "html", "title")
    val e = intercept[IllegalArgumentException](Extract.htmlExtract(df))
    assert(e.getMessage.contains("collide"))
  }
}
