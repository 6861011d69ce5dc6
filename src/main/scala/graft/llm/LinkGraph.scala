package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hyperlink extraction and host-graph authority scoring — the crawl-
  * prioritization half the frontier family ([[Sitemaps.frontier]],
  * [[RobotsTxt.gateUrls]], [[UrlOps.domainGate]]) still lacked: which
  * hosts are WORTH crawling first. Links come out of raw page HTML
  * (`<a href>` in either quote style — the [[Extract.withPageDirectives]]
  * quoting lesson applied from the start), collapse to a host-level
  * edge census, and rank by PageRank (Page, Brin, Motwani & Winograd
  * 1999) in INTEGER micro fixed-point — every iteration is pure
  * integer arithmetic, so the DuckDB oracle replays each one exactly
  * ([[sqlPagerankCtes]] unrolls them the way [[Bpe.sqlTrainCtes]]
  * unrolls merge rounds).
  *
  * Semantics (stated, both engines identical):
  *  - only absolute `http(s)://` hrefs count (relative/`mailto:`/`javascript:`
  *    links are frontier-internal or noise at host granularity);
  *  - edges are DISTINCT (src_host, dst_host) pairs for the rank (the
  *    census keeps multiplicities for reporting); self-loops drop;
  *  - rank r_{t+1}(v) = (150·r_0) DIV 1000 + (850·Σ_{u→v} r_t(u) DIV
  *    od(u)) DIV 1000 with r_0 = 10^6 DIV n — the damping-0.85 power
  *    iteration truncated per step; dangling-node mass and truncation
  *    remainders leak (standard simple variant, stated) — ranks are
  *    for ORDERING, not a probability measure.
  *
  * Scale shape: extraction is one narrow regexp pass riding the scan;
  * the edge census is one partial-aggregated exchange on (src, dst);
  * each rank iteration is one edges⋈ranks shuffle join (ranks is
  * host-count-sized, broadcastable for bounded frontiers) + one
  * partial-aggregated exchange on dst, with a persist barrier per
  * iteration so lineage stays flat — k iterations, k bounded shuffles,
  * never a corpus-sized stage after extraction. */
object LinkGraph {

  /** `<a … href="…">` / `<a … href='…'>` — RE2-safe, both quote
    * styles; unquoted hrefs are out of scope (stated). */
  val HrefDq = "<[aA][^>]*\\shref=\"([^\"]*)\""
  val HrefSq = "<[aA][^>]*\\shref='([^']*)'"

  /** One row per absolute http(s) link: adds `link`. Non-absolute
    * hrefs (relative paths, mailto:, javascript:) are dropped here —
    * host-graph granularity (stated in the class doc). */
  def withLinks(pages: DataFrame, htmlCol: String = "html"): DataFrame = {
    require(!pages.columns.contains("link"),
      "input column link collides with the output — rename it")
    val h = coalesce(col(htmlCol), lit(""))
    pages
      .withColumn("link", explode(concat(
        regexp_extract_all(h, lit(HrefDq), lit(1)),
        regexp_extract_all(h, lit(HrefSq), lit(1)))))
      .filter(col("link").rlike("^https?://"))
  }

  /** Host-level edge census `(src_host, dst_host, n)` from extracted
    * links: hosts by [[UrlOps.HostRe]] (userinfo skipped, IPv6 taken
    * whole), lowercased; self-loops and unparseable hosts drop. One
    * partial-aggregated exchange. */
  def hostEdges(links: DataFrame, srcUrlCol: String = "url",
                linkCol: String = "link"): DataFrame = {
    def hostOf(c: org.apache.spark.sql.Column) =
      lower(regexp_extract(c, UrlOps.HostRe, 1))
    links
      .select(hostOf(col(srcUrlCol)).as("src_host"),
        hostOf(col(linkCol)).as("dst_host"))
      .filter(col("src_host") =!= "" && col("dst_host") =!= "" &&
        col("src_host") =!= col("dst_host"))
      .groupBy(col("src_host"), col("dst_host"))
      .agg(count(lit(1)).as("n"))
  }

  /** Integer-micro PageRank over the DISTINCT edge set of a census —
    * `(host, rank_micro)` after `iters` damped power iterations (see
    * class doc for the exact recurrence). */
  def pagerank(edges: DataFrame, iters: Int = 4): DataFrame = {
    require(iters >= 1, s"iters=$iters: need at least one iteration")
    val e = graft.CacheBarriers.barrier(
      edges.select(col("src_host"), col("dst_host")).distinct())
    val nodes = e.select(col("src_host").as("host"))
      .union(e.select(col("dst_host").as("host"))).distinct()
    val nn = nodes.agg(count(lit(1)).as("__n"))
    val deg = graft.CacheBarriers.barrier(
      e.groupBy(col("src_host")).agg(count(lit(1)).as("__od")))
    val base = graft.CacheBarriers.barrier(
      nodes.crossJoin(broadcast(nn)))
    var r = base.select(col("host"),
      expr("1000000L DIV __n").as("r"), col("__n"))
    (1 to iters).foreach { _ =>
      val contrib = e
        .join(r.select(col("host"), col("r")),
          e("src_host") === col("host"))
        .join(deg, "src_host")
        .groupBy(col("dst_host"))
        .agg(sum(expr("r DIV __od")).as("__s"))
      r = graft.CacheBarriers.barrier(
        base.join(contrib, base("host") === contrib("dst_host"), "left")
          .select(base("host"),
            (expr("(150 * (1000000L DIV __n)) DIV 1000") +
              expr("(850 * coalesce(__s, 0L)) DIV 1000")).as("r"),
            col("__n")))
    }
    r.select(col("host"), col("r").as("rank_micro"))
  }

  // ── DuckDB side (same integer recurrence, iterations unrolled) ────────
  /** CTEs ending in `<out>(host, rank_micro)` over an edge CTE
    * `<edges>(src_host, dst_host)` (distinct pairs, no self-loops). */
  def sqlPagerankCtes(edges: String, iters: Int, out: String): String = {
    require(iters >= 1)
    val head =
      s"""prn AS (
         |  SELECT src_host AS host FROM $edges
         |  UNION SELECT dst_host FROM $edges),
         |prc AS (SELECT count(*) AS n FROM prn),
         |prd AS (SELECT src_host, count(*) AS od
         |        FROM $edges GROUP BY 1),
         |pr0 AS (SELECT host, 1000000 // n AS r FROM prn CROSS JOIN prc)"""
        .stripMargin
    val rounds = (1 to iters).map { i =>
      val prev = if (i == 1) "pr0" else s"pr${i - 1}"
      s"""prs$i AS (
         |  SELECT e.dst_host AS host, sum(p.r // d.od) AS s
         |  FROM $edges e
         |  JOIN $prev p ON e.src_host = p.host
         |  JOIN prd d ON e.src_host = d.src_host
         |  GROUP BY 1),
         |pr$i AS (
         |  SELECT nd.host,
         |         (150 * (1000000 // c.n)) // 1000 +
         |         (850 * coalesce(s.s, 0)) // 1000 AS r
         |  FROM prn nd CROSS JOIN prc c
         |  LEFT JOIN prs$i s ON nd.host = s.host)""".stripMargin
    }
    val fin = s"$out AS (SELECT host, r AS rank_micro FROM pr$iters)"
    (head +: rounds :+ fin).mkString(",\n")
  }
}
