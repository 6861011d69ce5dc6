package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** sitemap.xml ingestion + the politeness-scheduled crawl frontier —
  * the discovery half of the crawl-policy axis ([[RobotsTxt]] is the
  * permission half; together they are the two policy files every real
  * crawler fetches before any page). Sitemaps are simple enough for
  * shared-regex column algebra: `<urlset>` entries carry loc /
  * lastmod / changefreq / priority, `<sitemapindex>` entries point at
  * child sitemaps (the >50k-URL sharding convention).
  *
  * Scale shape: one sitemap = one string cell = one narrow
  * extract-all + explode riding the scan (sitemaps are ≤50 MB by
  * spec); the frontier composition is one domain-keyed join against
  * the broadcast-shaped policy table plus one per-domain window — the
  * window's partition is the domain, which is exactly the unit a
  * polite fetcher serializes on anyway. */
object Sitemaps {

  /** Explode sitemap bodies into entries:
    * `(…, kind, entry_idx, loc, lastmod, changefreq, priority_micro)`.
    * `kind` is `urlset` / `sitemapindex` / `` (unrecognized — fail
    * closed to zero entries); `priority_micro` is the 0–1 priority in
    * integer millionths (NULL when absent — the spec's 0.5 default is
    * the CALLER's choice, stated). Absent optional tags yield empty
    * strings (the engines' shared no-match value). */
  def parseEntries(df: DataFrame, bodyCol: String = "body"): DataFrame = {
    val working = Seq("kind", "entry_idx", "entry", "loc", "lastmod",
      "changefreq", "priority_micro", "__entries")
    val clash = df.columns.toSeq.intersect(working)
    require(clash.isEmpty, s"input columns ${clash.mkString(", ")} " +
      "collide with parseEntries working/output names — rename them")
    val b = coalesce(col(bodyCol), lit(""))
    val kind = when(b.contains("<urlset"), "urlset")
      .when(b.contains("<sitemapindex"), "sitemapindex")
      .otherwise("")
    def field(e: Column, name: String): Column =
      regexp_extract(e, s"(?s)<$name>(.*?)</$name>", 1)
    df.withColumn("kind", kind)
      .withColumn("__entries",
        when(col("kind") === "urlset",
          regexp_extract_all(b, lit("(?s)<url>(.*?)</url>"), lit(1)))
          .when(col("kind") === "sitemapindex",
            regexp_extract_all(b,
              lit("(?s)<sitemap>(.*?)</sitemap>"), lit(1)))
          .otherwise(array().cast("array<string>")))
      .select((df.columns.map(col) :+ col("kind") :+
        posexplode(col("__entries")).as(Seq("entry_idx", "entry"))): _*)
      .withColumn("loc", field(col("entry"), "loc"))
      .withColumn("lastmod", field(col("entry"), "lastmod"))
      .withColumn("changefreq", field(col("entry"), "changefreq"))
      .withColumn("priority_micro", when(
        field(col("entry"), "priority").rlike("^[01]\\.[0-9]$"),
        (regexp_extract(field(col("entry"), "priority"),
          "^([01])\\.", 1).cast("long") * 1000000L) +
          regexp_extract(field(col("entry"), "priority"),
            "\\.([0-9])$", 1).cast("long") * 100000L))
      .drop("entry")
  }

  /** The politeness-scheduled frontier: distinct allowed URLs of a
    * parsed-entries frame (urlset rows, deduped by loc keeping the min
    * id), gated by [[RobotsTxt.gateUrls]], ordered per domain by
    * (priority DESC NULLS LAST, loc ASC), with `fetch_at_ms` = seq ×
    * the domain's crawl-delay (seconds; `defaultDelaySec` when the
    * policy sets none) — the fetch schedule a polite crawler executes
    * per domain. */
  def frontier(entries: DataFrame, rules: DataFrame, targetUa: String,
               defaultDelaySec: Long = 1L,
               idCol: String = "doc_id"): DataFrame = {
    require(defaultDelaySec >= 0, s"frontier: $defaultDelaySec")
    val urls = entries
      .filter(col("kind") === "urlset" && col("loc") =!= "")
      .groupBy(col("loc"))
      .agg(min(col(idCol)).as(idCol),
        max(col("priority_micro")).as("priority_micro"))
      .select(col(idCol), col("loc"), col("priority_micro"),
        regexp_extract(col("loc"), UrlOps.HostRe, 1).as("domain"),
        coalesce(nullif(regexp_extract(col("loc"), UrlOps.PathRe, 1),
          lit("")), lit("/")).as("path"))
    // the gate's top-1 window partitions on the URL itself: after the
    // loc-keyed dedup one doc id can represent several locs, so the id
    // is payload here, not the match key
    val gated = RobotsTxt.gateUrls(urls, rules, targetUa,
      domainCol = "domain", pathCol = "path", idCol = "loc")
    val w = Window.partitionBy(col("domain"))
      .orderBy(col("priority_micro").desc_nulls_last, col("loc").asc)
    gated.filter(col("allowed"))
      .withColumn("seq", row_number().over(w).cast("long") - 1L)
      .withColumn("fetch_at_ms",
        col("seq") * (coalesce(col("crawl_delay"),
          lit(defaultDelaySec)) * 1000L))
  }
}
