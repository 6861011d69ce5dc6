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

  test("withAnchors pairs each href with ITS anchor text, both styles") {
    val out = LinkGraph.withAnchors(pages(
      "https://a.com/" ->
        ("""<a href="https://b.com/x">spark engine</a> mid """ +
          """<a class='k' href='https://c.com/y'>data pipeline</a>""" +
          """<a href="/rel">skip me</a>""")))
      .select("link", "anchor").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out === Map("https://b.com/x" -> "spark engine",
      "https://c.com/y" -> "data pipeline"))
  }

  test("anchorCensus aggregates anchor words per destination host") {
    import spark.implicits._
    val anchors = Seq(
      ("https://b.com/1", "fast spark"), ("https://b.com/2", "fast engine"),
      ("https://c.com/1", "slow")).toDF("link", "anchor")
    val cen = LinkGraph.anchorCensus(anchors, k = 2).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // b.com counts: fast 2, engine 1, spark 1; k=2 -> sub = 1 (3rd
    // largest), engine's 1 - 1 dies, fast survives at 2 - 1
    assert(cen === Map(("b.com", "fast") -> 1L, ("c.com", "slow") -> 1L))
  }

  test("crawlBudget apportions exactly, largest remainders first") {
    import spark.implicits._
    // shares 3:1:1 of 10 → quotas 6, 2, 2 exactly... then skew one
    val ranks = Seq(("a", 600000L), ("b", 200000L), ("c", 200000L))
      .toDF("host", "rank_micro")
    val out = LinkGraph.crawlBudget(ranks, 10L).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out === Map("a" -> 6L, "b" -> 2L, "c" -> 2L))
    // 7 slots at shares 1:1:1 → bases 2,2,2, remainder slot to host ASC
    val tie = LinkGraph.crawlBudget(
      Seq(("x", 5L), ("y", 5L), ("z", 5L)).toDF("host", "rank_micro"),
      7L).collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(tie === Map("x" -> 3L, "y" -> 2L, "z" -> 2L))
  }

  test("crawlBudget always sums to the budget") {
    import spark.implicits._
    val ranks = Seq(("a", 49999L), ("b", 375830L), ("c", 574164L),
      ("d", 7L)).toDF("host", "rank_micro")
    for (b <- Seq(0L, 1L, 13L, 997L)) {
      val slots = LinkGraph.crawlBudget(ranks, b).collect()
        .map(_.getLong(2))
      assert(slots.sum === b, s"budget $b")
      assert(slots.forall(_ >= 0L))
    }
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
