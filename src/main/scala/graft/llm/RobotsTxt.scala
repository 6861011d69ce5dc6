package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt crawl-policy gate — the domain-level half of the crawl
  * respect story ([[Extract.withPageDirectives]] is the page-level
  * half): parse fetched robots.txt bodies into a per-domain rule
  * table, then gate URLs by the REP precedence rules (RFC 9309 / the
  * de-facto Google semantics): choose the most specific matching
  * user-agent group, match the URL path against that group's
  * allow/disallow patterns (`*` wildcards, trailing `$` anchor),
  * longest pattern wins, allow beats disallow on ties, no match =
  * allow.
  *
  * Stated simplifications (each the common crawler behavior):
  * user-agent matching is case-insensitive prefix match (`graftbot`
  * matches a `graft` group); when several groups tie on specificity
  * the earliest group wins (RFC 9309 merges them — a one-line fold if
  * a deployment needs it); `crawl-delay` (non-RFC but ubiquitous) is
  * carried per group.
  *
  * Scale shape: robots bodies are KB-bounded (crawlers cap at 500 KiB
  * by convention), so the line explode + two per-domain windows are
  * narrow work proportional to the policy corpus — domains-sized, not
  * corpus-sized. The gate is one join of URLs to the chosen-group rule
  * table on the domain key (broadcast when the policy table is small,
  * hash join on domain otherwise) plus a per-URL top-1 window over the
  * handful of matching rules. Pure shared-SQL column algebra — the
  * DuckDB twins replay parse, precedence, and wildcard matching
  * exactly. */
object RobotsTxt {

  // ── parse ─────────────────────────────────────────────────────────────

  /** Parse robots.txt bodies into rule rows: one row per
    * (user-agent line × allow/disallow/crawl-delay line) of each
    * group, `(domainCol, group_id, ua, directive, value, pos)`.
    * Grouping is the standard REP shape: consecutive `User-agent`
    * lines open a group shared by the directive lines that follow;
    * `#` comments (whole-line and inline) strip; keys are
    * case-insensitive; lines before any user-agent line are ignored. */
  def parseRules(robots: DataFrame, domainCol: String = "domain",
                 bodyCol: String = "body"): DataFrame = {
    val working = Seq("pos", "line", "key", "value", "ua", "directive",
      "group_id", "__clean", "__is_ua", "__boundary")
    val clash = robots.columns.toSeq.intersect(working)
    require(clash.isEmpty, s"input columns ${clash.mkString(", ")} " +
      "collide with parseRules working/output names — rename them")
    val w = Window.partitionBy(col(domainCol)).orderBy(col("pos"))
    val lines = robots
      .select(col(domainCol),
        posexplode(split(coalesce(col(bodyCol), lit("")), "\n", -1))
          .as(Seq("pos", "line")))
      .withColumn("__clean",
        trim(regexp_replace(col("line"), "#.*$", "")))
      .withColumn("key",
        lower(regexp_extract(col("__clean"), "^([A-Za-z-]+)\\s*:", 1)))
      .withColumn("value",
        trim(regexp_extract(col("__clean"), "^[A-Za-z-]+\\s*:\\s*(.*)$", 1)))
      .withColumn("__is_ua", col("key") === "user-agent")
      .withColumn("__boundary", col("__is_ua") &&
        !lag(col("__is_ua"), 1, false).over(w))
      .withColumn("group_id",
        sum(when(col("__boundary"), 1L).otherwise(0L))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val uas = lines.filter(col("__is_ua"))
      .select(col(domainCol), col("group_id"),
        lower(col("value")).as("ua"))
    val rules = lines
      .filter(col("key").isin("allow", "disallow", "crawl-delay") &&
        col("group_id") >= 1)
      .select(col(domainCol), col("group_id"),
        col("key").as("directive"), col("value"), col("pos"))
    uas.join(rules, Seq(domainCol, "group_id"))
      .select(col(domainCol), col("group_id"), col("ua"),
        col("directive"), col("value"), col("pos"))
  }

  /** `Sitemap:` discovery — REP's third directive class, GLOBAL (a
    * sitemap line binds to no user-agent group, so it parses
    * independently of [[parseRules]]' group machinery): one row per
    * `Sitemap:` line, key matched case-insensitively, comments
    * stripped by the same `#.*$` rule as every other line (stated: a
    * raw `#` fragment in the URL would be cut — REP comments win).
    * Output `(domain…, pos, sitemap_url)`; empty values drop. This is
    * the discovery half the frontier composes with
    * [[Sitemaps.parseEntries]]: robots.txt names the sitemaps, the
    * sitemaps name the URLs. One narrow explode — no shuffle. */
  def sitemapUrls(robots: DataFrame, domainCol: String = "domain",
                  bodyCol: String = "body"): DataFrame = {
    val working = Seq("pos", "sitemap_url", "__line", "__clean")
    val clash = robots.columns.toSeq.intersect(working)
    require(clash.isEmpty, s"input columns ${clash.mkString(", ")} " +
      "collide with sitemapUrls working/output names — rename them")
    robots
      .select(col(domainCol),
        posexplode(split(coalesce(col(bodyCol), lit("")), "\n", -1))
          .as(Seq("pos", "__line")))
      .withColumn("__clean",
        trim(regexp_replace(col("__line"), "#.*$", "")))
      .withColumn("sitemap_url",
        trim(regexp_extract(col("__clean"),
          "^(?i)sitemap\\s*:\\s*(.*)$", 1)))
      .filter(col("sitemap_url") =!= "")
      .select(col(domainCol), col("pos"), col("sitemap_url"))
  }

  /** DuckDB twin of [[sitemapUrls]]: CTEs ending in
    * `<out>(domain, pos, sitemap_url)` over `<src>(domain, body)`. */
  def sqlSitemapCtes(src: String = "rsrc", out: String = "rsm"): String =
    s"""${out}l AS (
       |  SELECT domain, unnest(range(0, len(bls))) AS pos,
       |         trim(regexp_replace(unnest(bls), '#.*$$', '')) AS cl
       |  FROM (SELECT domain, string_split(body, chr(10)) AS bls
       |        FROM $src)),
       |$out AS (
       |  SELECT domain, pos,
       |         trim(regexp_extract(cl, '^(?i)sitemap\\s*:\\s*(.*)$$', 1))
       |           AS sitemap_url
       |  FROM ${out}l
       |  WHERE trim(regexp_extract(cl, '^(?i)sitemap\\s*:\\s*(.*)$$', 1))
       |        <> '')""".stripMargin

  /** Engine-shared SQL (runs verbatim under Spark AND DuckDB): a REP
    * path pattern rendered as a regex — metacharacters escaped via
    * literal `replace` chains (chr(92) = backslash, so no string-
    * literal escape divergence between engines), `*` → `.*`, a
    * trailing `$` kept as the end anchor. */
  def sqlPatternRegex(p: String): String = {
    val anchored = s"substr($p, length($p), 1) = '$$'"
    val body = s"(CASE WHEN $anchored THEN substr($p, 1, length($p) - 1) " +
      s"ELSE $p END)"
    val esc = Seq(".", "^", "$", "+", "?", "(", ")", "[", "]", "{", "}",
      "|").foldLeft(s"replace($body, chr(92), chr(92) || chr(92))") {
      (acc, m) => s"replace($acc, '$m', chr(92) || '$m')"
    }
    s"'^' || replace($esc, '*', '.*') || " +
      s"(CASE WHEN $anchored THEN chr(36) ELSE '' END)"
  }

  // ── gate ──────────────────────────────────────────────────────────────

  /** Gate URLs against parsed rules for one crawler identity: adds
    * `allowed`, `matched_directive`, `matched_pattern`, `crawl_delay`.
    * Precedence exactly as the class doc states. `urls` rows whose
    * domain has no rules (or no group matching `targetUa`) pass with
    * `allowed = true` and NULL match columns — REP's default-allow. */
  def gateUrls(urls: DataFrame, rules: DataFrame, targetUa: String,
               domainCol: String = "domain",
               pathCol: String = "path",
               idCol: String = "doc_id"): DataFrame = {
    val working = Seq("allowed", "matched_directive", "matched_pattern",
      "crawl_delay", "__spec", "__grank", "__regex", "__mrank", "__hit",
      "ua", "directive", "value", "group_id")
    val clash = urls.columns.toSeq.intersect(working)
    require(clash.isEmpty, s"input columns ${clash.mkString(", ")} " +
      "collide with gateUrls working/output names — rename them")
    val ua = lit(targetUa.toLowerCase)
    // group election: most specific matching UA, earliest group on tie
    val spec = when(col("ua") === "*", lit(0))
      .when(ua.startsWith(col("ua")), length(col("ua")))
    val wg = Window.partitionBy(col(domainCol))
      .orderBy(col("__spec").desc, col("group_id").asc)
    val chosenGroups = rules
      .select(col(domainCol), col("group_id"), col("ua")).distinct()
      .withColumn("__spec", spec)
      .filter(col("__spec").isNotNull)
      .withColumn("__grank", dense_rank().over(wg))
      .filter(col("__grank") === 1)
      .select(col(domainCol), col("group_id")).distinct()
    val chosen = rules.join(chosenGroups, Seq(domainCol, "group_id"))
    val delays = chosen.filter(col("directive") === "crawl-delay")
      .groupBy(col(domainCol))
      .agg(max(col("value").cast("long")).as("crawl_delay"))
    // distinct: a rule row fans out once per user-agent line of its
    // group in parseRules' output — the gate needs each rule once
    val paths = chosen
      .filter(col("directive").isin("allow", "disallow") &&
        col("value") =!= "")
      .select(col(domainCol), col("directive"), col("value")).distinct()
      .withColumn("__regex", expr(sqlPatternRegex("value")))
    // per-URL best rule: longest pattern, allow beats disallow on tie
    val joined = urls.join(paths, Seq(domainCol), "left")
      .withColumn("__hit", col("value").isNotNull &&
        expr(s"regexp_like($pathCol, __regex)"))
    val wm = Window.partitionBy(col(idCol))
      .orderBy(when(col("__hit"), length(col("value"))).otherwise(-1).desc,
        when(col("directive") === "allow", 1).otherwise(0).desc,
        col("value").asc_nulls_last)
    joined
      .withColumn("__mrank", row_number().over(wm))
      .filter(col("__mrank") === 1)
      .withColumn("matched_directive",
        when(col("__hit"), col("directive")))
      .withColumn("matched_pattern", when(col("__hit"), col("value")))
      .withColumn("allowed",
        coalesce(col("matched_directive") =!= "disallow", lit(true)))
      .join(delays, Seq(domainCol), "left")
      .select((urls.columns.map(col) :+ col("allowed") :+
        col("matched_directive") :+ col("matched_pattern") :+
        col("crawl_delay")): _*)
  }

  // ── DuckDB twins ──────────────────────────────────────────────────────

  /** CTE chain replaying [[parseRules]] over a CTE
    * `rsrc(domain, body)` → `rrules(domain, group_id, ua, directive,
    * value, pos)`. */
  def sqlRulesCtes: String =
    s"""rlines AS (
       |  SELECT domain, unnest(range(0, len(bls))) AS pos,
       |         trim(regexp_replace(unnest(bls), '#.*$$', '')) AS cl
       |  FROM (SELECT domain, string_split(body, chr(10)) AS bls
       |        FROM rsrc)),
       |rkeyed AS (
       |  SELECT domain, pos,
       |         lower(regexp_extract(cl, '^([A-Za-z-]+)\\s*:', 1)) AS key,
       |         trim(regexp_extract(cl, '^[A-Za-z-]+\\s*:\\s*(.*)$$', 1))
       |           AS value
       |  FROM rlines),
       |rbnd AS (
       |  SELECT *, (key = 'user-agent' AND NOT
       |           coalesce(lag(key = 'user-agent') OVER
       |             (PARTITION BY domain ORDER BY pos), false))
       |           AS boundary
       |  FROM rkeyed),
       |rgrp AS (
       |  SELECT *, sum(CASE WHEN boundary THEN 1 ELSE 0 END) OVER
       |           (PARTITION BY domain ORDER BY pos
       |            ROWS UNBOUNDED PRECEDING) AS group_id
       |  FROM rbnd),
       |ruas AS (SELECT domain, group_id, lower(value) AS ua FROM rgrp
       |         WHERE key = 'user-agent'),
       |rrules AS (
       |  SELECT r.domain, r.group_id, u.ua, r.key AS directive,
       |         r.value, r.pos
       |  FROM rgrp r JOIN ruas u USING (domain, group_id)
       |  WHERE r.key IN ('allow', 'disallow', 'crawl-delay')
       |    AND r.group_id >= 1)""".stripMargin
}
