package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.LinkGraph

/** Link extraction (both quote styles, absolute-only gate), host edge
  * semantics (lowercase, userinfo skip, self-loop drop), and the
  * integer PageRank recurrence hand-checked to the exact micro value. */
class LinkGraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def pages(rows: (String, String)*) = {
    import spark.implicits._
    rows.toDF("url", "html")
  }

  test("withLinks parses both quote styles and drops non-absolute hrefs") {
    val out = LinkGraph.withLinks(pages(
      "https://a.com/p" ->
        ("""<a href="https://b.com/x">dq</a>""" +
          """<a class='k' href='https://c.com/y?q=1'>sq</a>""" +
          """<a href="/rel">rel</a><a href="mailto:a@b.c">m</a>""" +
          """<a href="javascript:void(0)">js</a>""")))
      .select("link").collect().map(_.getString(0)).sorted
    assert(out.toSeq === Seq("https://b.com/x", "https://c.com/y?q=1"))
  }

  test("null html yields no links, not a crash") {
    assert(LinkGraph.withLinks(pages("https://a.com/" -> null)).count() === 0)
  }

  test("hostEdges lowercases, skips userinfo, drops self-loops") {
    val links = LinkGraph.withLinks(pages(
      "https://A.com/p" ->
        ("""<a href="https://user:pw@B.com/x">1</a>""" +
          """<a href="https://a.com/self">2</a>""" +
          """<a href="https://b.com/again">3</a>""")))
    val edges = LinkGraph.hostEdges(links).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(edges === Map(("a.com", "b.com") -> 2L))
  }

  test("pagerank matches the hand-run integer recurrence") {
    import spark.implicits._
    // a->b, b->c, c->b; n=3, r0=333333, two iterations by hand
    val edges = Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "b", 1L))
      .toDF("src_host", "dst_host", "n")
    val r = LinkGraph.pagerank(edges, iters = 2).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r === Map("a" -> 49999L, "b" -> 375830L, "c" -> 574164L))
  }

  test("pagerank is deterministic and rank mass stays bounded") {
    import spark.implicits._
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
      ("d", "a")).toDF("src_host", "dst_host")
      .withColumn("n", lit(1L))
    def run() = LinkGraph.pagerank(edges, iters = 4).orderBy("host")
      .collect().map(x => (x.getString(0), x.getLong(1))).toSeq
    val r = run()
    assert(r === run())
    assert(r.map(_._2).sum <= 1000000L) // truncation only ever leaks mass
    assert(r.map(_._2).forall(_ >= 0L))
  }
}
