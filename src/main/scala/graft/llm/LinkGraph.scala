package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
  * out-degrees join the edge table once OUTSIDE the loop, and each
  * rank iteration is then one edges⋈broadcast(ranks) join (ranks is
  * host-count-sized; at web scale swap the hint for a shuffle join —
  * the recurrence is identical) + one partial-aggregated exchange on
  * dst — k iterations, k bounded exchanges, never a corpus-sized
  * stage after extraction. */
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

  /** Simple (non-nested) anchors, both quote styles: href + the text
    * up to the closing tag. Nested markup inside `<a>` is out of scope
    * (the [[Extract]] simplification, stated). */
  val AnchorDq = "<[aA][^>]*\\shref=\"([^\"]*)\"[^>]*>([^<]*)</[aA]>"
  val AnchorSq = "<[aA][^>]*\\shref='([^']*)'[^>]*>([^<]*)</[aA]>"

  /** One row per absolute http(s) link WITH its anchor text: adds
    * `link`, `anchor`. The anchor is the web's oldest relevance label —
    * what OTHER pages call a page — and feeds the per-host anchor-term
    * census ([[anchorCensus]]). Same narrow-scan shape as
    * [[withLinks]]. */
  def withAnchors(pages: DataFrame, htmlCol: String = "html"): DataFrame = {
    val working = Seq("link", "anchor")
    val clash = pages.columns.toSeq.intersect(working)
    require(clash.isEmpty, s"input columns ${clash.mkString(", ")} " +
      "collide with withAnchors output names — rename them")
    val h = coalesce(col(htmlCol), lit(""))
    def pairs(re: String) = zip_with(
      regexp_extract_all(h, lit(re), lit(1)),
      regexp_extract_all(h, lit(re), lit(2)),
      (l, t) => struct(l.as("link"), t.as("anchor")))
    pages
      .withColumn("__pair",
        explode(concat(pairs(AnchorDq), pairs(AnchorSq))))
      .withColumn("link", col("__pair.link"))
      .withColumn("anchor", col("__pair.anchor"))
      .drop("__pair")
      .filter(col("link").rlike("^https?://"))
  }

  /** Per-destination-host TOP anchor terms as a Misra–Gries summary
    * `(dst_host, term, n, err)` — the config-sized "what the web calls
    * this host" artifact (self-links included: a site's own nav labels
    * are anchor evidence too, stated). One map-side-combining census
    * exchange, then [[HeavyHitters.truncate]]'s single window exchange.
    */
  def anchorCensus(anchors: DataFrame,
                   k: Int = HeavyHitters.KDefault): DataFrame = {
    val dst = lower(regexp_extract(col("link"), UrlOps.HostRe, 1))
    val words = anchors
      .select(dst.as("dst_host"),
        explode(TextHash.words(col("anchor"))).as("term"))
      .filter(col("dst_host") =!= "")
    HeavyHitters.truncate(
      words.groupBy(col("dst_host"), col("term"))
        .agg(count(lit(1)).as("n"))
        .withColumn("err", lit(0L)),
      k, Seq("dst_host"))
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

  /** Fold a crawl-disjoint batch's edge census into a persisted one —
    * pure per-(src, dst) addition (the [[graft.source.Tar
    * .mergeEntryCensus]] convention on the link axis): a rolling crawl
    * appends new batches without re-reading old pages, and the folded
    * census feeds [[pagerank]] unchanged. Census-sized, never the
    * corpus. */
  def mergeEdgeCensus(persisted: DataFrame, batch: DataFrame): DataFrame =
    persisted.unionByName(batch)
      .groupBy(col("src_host"), col("dst_host"))
      .agg(sum(col("n")).as("n"))

  /** Integer-micro PageRank over the DISTINCT edge set of a census —
    * `(host, rank_micro)` after `iters` damped power iterations (see
    * class doc for the exact recurrence). */
  def pagerank(edges: DataFrame, iters: Int = 4): DataFrame = {
    require(iters >= 1, s"iters=$iters: need at least one iteration")
    val e = edges.select(col("src_host"), col("dst_host")).distinct()
    val nodes = e.select(col("src_host").as("host"))
      .union(e.select(col("dst_host").as("host"))).distinct()
    val nn = nodes.agg(count(lit(1)).as("__n"))
    val deg = e.groupBy(col("src_host")).agg(count(lit(1)).as("__od"))
    // out-degree rides the edge table ONCE, outside the loop — one
    // join per iteration, not two
    val e2 = graft.CacheBarriers.barrier(e.join(deg, "src_host"))
    val base = graft.CacheBarriers.barrier(
      nodes.crossJoin(broadcast(nn)))
    var r = base.select(col("host"),
      expr("1000000L DIV __n").as("r"), col("__n"))
    (1 to iters).foreach { _ =>
      // ranks are host-count-sized — broadcast them to the edge side
      // (at web scale swap for a shuffle join; the recurrence is
      // identical either way)
      val contrib = e2
        .join(broadcast(r.select(col("host").as("__h"), col("r"))),
          col("src_host") === col("__h"))
        .groupBy(col("dst_host"))
        .agg(sum(expr("r DIV __od")).as("__s"))
      r = base.join(broadcast(contrib),
        base("host") === contrib("dst_host"), "left")
        .select(base("host"),
          (expr("(150 * (1000000L DIV __n)) DIV 1000") +
            expr("(850 * coalesce(__s, 0L)) DIV 1000")).as("r"),
          col("__n"))
    }
    r.select(col("host"), col("r").as("rank_micro"))
  }

  /** Crawl-budget apportionment: split an integer fetch budget across
    * hosts PROPORTIONAL to rank by the largest-remainder (Hamilton)
    * method — `base = rank·B DIV Σrank` each, then the leftover slots
    * go to the largest remainders (ties by host ASC — total order,
    * both engines agree). Exactly Σslots = B by construction; pure
    * integer arithmetic, so the oracle replays every slot
    * ([[sqlCrawlBudgetCtes]]).
    *
    * Scale shape: the whole allocation is ONE single-partition window
    * stage over the HOST frame — host-count-sized by definition (the
    * thing being apportioned), never the corpus; no broadcast jobs,
    * no extra actions (the broadcast-per-aggregate version cost ~1 s
    * of fixed scheduling per job). For frontiers too large for one
    * partition, apportion per region/tenant by adding the partition
    * key to every window. */
  def crawlBudget(ranks: DataFrame, budget: Long): DataFrame = {
    require(budget >= 0, s"budget=$budget: negative fetch budgets")
    val wAll = Window.partitionBy()
    val wOrd = Window.orderBy(col("__rem").desc, col("host").asc)
    ranks
      .withColumn("__tot", sum(col("rank_micro")).over(wAll))
      .withColumn("__base", expr(s"rank_micro * ${budget}L DIV __tot"))
      .withColumn("__rem", expr(s"rank_micro * ${budget}L % __tot"))
      .withColumn("__left", lit(budget) - sum(col("__base")).over(wAll))
      .withColumn("__rk", row_number().over(wOrd))
      .withColumn("slots", col("__base") +
        when(col("__rk") <= col("__left"), lit(1L)).otherwise(lit(0L)))
      .select(col("host"), col("rank_micro"), col("slots"))
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

  /** CTEs ending in `<out>(host, rank_micro, slots)` — the
    * [[crawlBudget]] twin over `<ranks>(host, rank_micro)`. */
  def sqlCrawlBudgetCtes(ranks: String, budget: Long,
                         out: String): String =
    s"""cbt AS (SELECT sum(rank_micro) AS tot FROM $ranks),
       |cbb AS (
       |  SELECT host, rank_micro,
       |         (rank_micro * $budget) // tot AS base,
       |         (rank_micro * $budget) % tot AS rem
       |  FROM $ranks CROSS JOIN cbt),
       |cbl AS (SELECT $budget - sum(base) AS leftover FROM cbb),
       |$out AS (
       |  SELECT host, rank_micro,
       |         base + CASE WHEN row_number()
       |             OVER (ORDER BY rem DESC, host ASC) <= leftover
       |           THEN 1 ELSE 0 END AS slots
       |  FROM cbb CROSS JOIN cbl)""".stripMargin
}
