package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL / domain curation axis — the RefinedWeb-class URL filter stage
  * (Penedo et al. 2023 §3.1 run URL blocklists and per-domain stats
  * before any content rule): parse scheme/host/path/query out of a URL
  * column, reduce the host to its REGISTERED DOMAIN with the public-
  * suffix-list algorithm (publicsuffix.org/list: longest matching rule
  * wins, `*.tld` wildcards match one extra label, `!host` exceptions
  * beat everything), then gate per domain. The reference has no URL
  * operator (monstache namespaces are `db.collection` strings); this is
  * training-data extension surface.
  *
  * Spark-first shape: the suffix table is CONFIG-SIZED (the real PSL is
  * ~10k rules — kilobytes), so it ships inside the plan as literal
  * arrays and the whole lookup is per-row column algebra over the
  * host's label list: candidate suffixes of k labels probe the rule
  * sets via `array_contains`, `array_max` picks the longest match. No
  * UDF, no join, NO SHUFFLE — at 100 TB the lookup rides the scan,
  * where a rule-table join would explode candidates ×k and re-shuffle
  * the corpus to group them back. (A broadcast join reaches the same
  * no-shuffle scan only until the groupBy; the literal form never
  * leaves the row.) The oracle replays the same algebra over the same
  * spliced rule literals.
  *
  * PSL semantics implemented: plain rules, wildcard rules (`*.` + one
  * label), exception rules (leftmost label dropped from the prevailing
  * suffix); no match defaults to the `*` rule (the bare TLD). The
  * registered domain is the public suffix plus one label; a host that
  * IS a public suffix has none (NULL). */
object UrlOps {

  /** A public-suffix rule set. `exception` entries are stored WITHOUT
    * the `!` mark; wildcard entries keep their `*.` head. */
  final case class SuffixRules(plain: Seq[String], wildcard: Seq[String],
                               exception: Seq[String]) {
    require(wildcard.forall(_.startsWith("*.")),
      "wildcard rules must start with '*.'")
    require(exception.forall(_.count(_ == '.') >= 1),
      "exception rules need at least two labels")
    /** Longest rule, in labels — bounds the candidate probe count. */
    val maxLabels: Int =
      (plain.map(_.count(_ == '.') + 1) ++
        wildcard.map(_.count(_ == '.') + 1) ++
        exception.map(_.count(_ == '.') + 1) ++ Seq(1)).max
  }

  /** A deterministic config-sized default: common TLDs, two-label
    * suffixes, a hosted-platform suffix, and the classic `*.ck` /
    * `!www.ck` wildcard+exception pair. A deployment swaps in the full
    * published list — same algebra, longer literals. */
  val DefaultRules: SuffixRules = SuffixRules(
    plain = Seq("com", "org", "net", "io", "uk", "co.uk", "org.uk",
      "jp", "co.jp", "github.io"),
    wildcard = Seq("*.ck"),
    exception = Seq("www.ck"))

  /** URL part regexes — RE2-safe (no lookaround/backrefs), one
    * definition for both engines. The host match first skips an
    * optional `userinfo@` prefix (crawls DO carry
    * `https://alice:pw@host/` URLs; without the skip every userinfo
    * URL would collapse onto the same false 'alice' host and URL-keyed
    * dedup would drop documents across real hosts), then takes either
    * a bracketed IPv6 literal whole (`[2001:db8::1]`, brackets kept)
    * or a regular host stopped at `/ ? #` or `:` (port); path starts
    * at the first `/` after the authority. */
  val SchemeRe = "^([a-z][a-z0-9+.-]*)://"
  val HostRe =
    "^[a-z][a-z0-9+.-]*://(?:[^/?#@]*@)?(\\[[^\\]]*\\]|[^/?#:@]+)"
  val PathRe = "^[a-z][a-z0-9+.-]*://[^/?#]*(/[^?#]*)"
  val QueryRe = "\\?([^#]*)"

  /** Adds `scheme`, `host`, `path`, `query` (empty string when absent —
    * both engines' no-match value, stated rather than NULL-juggled). */
  def withUrlParts(df: DataFrame, urlCol: String = "url"): DataFrame = {
    val working = Seq("scheme", "host", "path", "query")
    val clash = df.columns.toSeq.intersect(working)
    require(clash.isEmpty, s"input columns ${clash.mkString(", ")} " +
      "collide with withUrlParts output names — rename them")
    val u = coalesce(col(urlCol), lit(""))
    df.withColumn("scheme", regexp_extract(u, SchemeRe, 1))
      .withColumn("host", regexp_extract(u, HostRe, 1))
      .withColumn("path", regexp_extract(u, PathRe, 1))
      .withColumn("query", regexp_extract(u, QueryRe, 1))
  }

  /** Adds `public_suffix` and `registered_domain` from a host column by
    * the PSL algorithm over `rules`. NULL/empty hosts yield NULLs. */
  def withDomain(df: DataFrame, hostCol: String = "host",
                 rules: SuffixRules = DefaultRules): DataFrame = {
    val working = Seq("public_suffix", "registered_domain")
    val clash = df.columns.toSeq.intersect(working)
    require(clash.isEmpty, s"input columns ${clash.mkString(", ")} " +
      "collide with withDomain output names — rename them")
    // IP literals have no public suffix: bracketed IPv6 hosts fail
    // closed to (NULL, NULL) rather than electing '[2001' as a suffix
    val lbl = split(col(hostCol), "\\.")
    val n = size(lbl)
    def suf(k: Column): Column =
      array_join(slice(lbl, n - k + 1, k), ".")
    val ks = sequence(lit(1), least(n, lit(rules.maxLabels)))
    val plainArr = typedLit(rules.plain)
    val wildArr = typedLit(rules.wildcard)
    val excArr = typedLit(rules.exception)
    val kp = array_max(filter(ks, k => array_contains(plainArr, suf(k))))
    val kw = array_max(filter(ks, k =>
      k > 1 && array_contains(wildArr, concat(lit("*."), suf(k - 1)))))
    val ke = array_max(filter(ks, k => array_contains(excArr, suf(k))))
    val psLen = when(ke.isNotNull, ke - 1)
      .otherwise(greatest(coalesce(kp, lit(1)), coalesce(kw, lit(1))))
    val ok = col(hostCol).isNotNull && length(col(hostCol)) > 0 &&
      !col(hostCol).startsWith("[")
    df.withColumn("public_suffix", when(ok, suf(psLen)))
      .withColumn("registered_domain",
        when(ok && n > psLen, suf(psLen + 1)))
  }

  /** Query params canonicalization strips: exact names plus the
    * `utm_` prefix family — the tracking decorations that make one page
    * look like many URLs. Extend per deployment; the list is plan
    * literal like the suffix table. */
  val TrackingParams: Seq[String] =
    Seq("ref", "fbclid", "gclid", "msclkid", "igshid")
  val TrackingPrefix = "utm_"

  /** URL canonicalization — the step BEFORE URL-keyed exact dedup
    * (RefinedWeb §3.1 dedups by URL before any content pass; without
    * canonicalization every tracking decoration defeats it): lowercase
    * scheme and host, drop default ports (https:443 / http:80), drop
    * the fragment, strip tracking params and SORT the survivors,
    * normalize the path's trailing slashes (empty → `/`). Adds
    * `canonical_url`. Pure per-row column algebra, shared-regex with
    * the oracle; dot-segment resolution (`/a/../b`) is out of scope —
    * stated, the corpus contract is crawler-emitted absolute URLs.
    * A `userinfo@` prefix is stripped before host extraction (see
    * [[HostRe]] — two URLs differing only in userinfo are the same
    * page); bracketed IPv6 hosts yield a NULL `canonical_url` — the
    * colon-laden literal defeats the port split, so they fail CLOSED
    * to the no-dedup path rather than collapsing onto a wrong key. */
  def withCanonicalUrl(df: DataFrame, urlCol: String = "url"): DataFrame = {
    require(!df.columns.contains("canonical_url"),
      "input column canonical_url collides with the output — rename it")
    val u = coalesce(col(urlCol), lit(""))
    val scheme = lower(regexp_extract(u, SchemeRe, 1))
    val hostPort = regexp_extract(u,
      "^[a-z][a-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#]+)", 1)
    val host = lower(element_at(split(hostPort, ":"), 1))
    val port = when(size(split(hostPort, ":")) > 1,
      element_at(split(hostPort, ":"), 2))
    val portPart = when(port.isNull, lit(""))
      .when(scheme === "https" && port === "443", lit(""))
      .when(scheme === "http" && port === "80", lit(""))
      .otherwise(concat(lit(":"), port))
    val rawPath = regexp_extract(u, PathRe, 1)
    val trimmed = rtrim(rawPath, "/")
    val path = when(trimmed === "", lit("/")).otherwise(trimmed)
    val q = regexp_extract(u, QueryRe, 1)
    val keptParams = array_sort(filter(split(q, "&"), p =>
      p =!= "" && !p.startsWith(TrackingPrefix) &&
        !array_contains(typedLit(TrackingParams),
          element_at(split(p, "="), 1))))
    val qPart = when(size(keptParams) > 0,
      concat(lit("?"), array_join(keptParams, "&"))).otherwise(lit(""))
    df.withColumn("canonical_url",
      when(scheme === "" || host === "" || hostPort.startsWith("["),
        lit(null).cast("string"))
        .otherwise(concat(scheme, lit("://"), host, portPart, path, qPart)))
  }

  /** The RefinedWeb-style domain gate: `blocked` (registered domain on
    * the blocklist) and `kept` (not blocked AND within the first
    * `maxPerDomain` rows of its domain by `tieCol` — the per-domain cap
    * that stops any one site from dominating the corpus). Rows with a
    * NULL registered domain (bare public suffixes, unparseable hosts)
    * pass through ungated — stated: a cap keyed on nothing would
    * lump them into one false mega-domain.
    *
    * Scale shape: the blocklist rides the plan as a literal
    * (config-sized, like the suffix table); the cap is ONE
    * domain-keyed window — the q74 source-gate shape. Domain skew
    * (one huge site) is real at 100 TB: cap first at a coarser
    * deterministic sub-key ([[graft.operators.Skew]]) or pre-aggregate
    * counts if a single domain exceeds a partition. */
  def domainGate(df: DataFrame, blocklist: Seq[String], maxPerDomain: Int,
                 tieCol: String = "doc_id",
                 domainCol: String = "registered_domain"): DataFrame = {
    require(maxPerDomain > 0, s"domainGate: maxPerDomain=$maxPerDomain")
    val working = Seq("blocked", "kept", "__rnk")
    val clash = df.columns.toSeq.intersect(working)
    require(clash.isEmpty, s"input columns ${clash.mkString(", ")} " +
      "collide with domainGate working/output names — rename them")
    val blk = typedLit(blocklist)
    val w = Window.partitionBy(col(domainCol)).orderBy(col(tieCol).asc)
    df.withColumn("blocked",
        col(domainCol).isNotNull && array_contains(blk, col(domainCol)))
      .withColumn("__rnk",
        when(col(domainCol).isNotNull, row_number().over(w)))
      .withColumn("kept", !col("blocked") &&
        (col(domainCol).isNull || col("__rnk") <= maxPerDomain))
      .drop("__rnk")
  }

  /** Per-registered-domain census — the ADDITIVE artifact of the URL
    * axis (the q74 source-counts convention on domains): per-domain doc
    * count plus an id-sum evidence column, both pure sums, so
    * doc-disjoint batches fold by [[mergeDomainCensus]] into exactly
    * the union census and a year-long crawl never re-reads old
    * batches. The NULL-domain group is carried (it is real corpus
    * mass); one domain-keyed partial-aggregated exchange. */
  def domainCensus(docs: DataFrame,
                   domainCol: String = "registered_domain"): DataFrame =
    docs.groupBy(col(domainCol).as("registered_domain"))
      .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"))

  /** Fold a doc-disjoint batch's census into a persisted one — pure
    * per-domain addition (census-sized aggregation, never the corpus). */
  def mergeDomainCensus(persisted: DataFrame, batch: DataFrame): DataFrame =
    persisted.unionByName(batch)
      .groupBy("registered_domain")
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("id_sum")).as("id_sum"))

  /** Census-level gate verdict: a domain survives when it is not
    * blocklisted AND holds at most `maxShareMicro` millionths of the
    * corpus (the spam-farm share cap — RefinedWeb's domain-dominance
    * concern at census granularity; [[domainGate]] is the row-level
    * form). NULL domains are never blocked (nothing to key on); the
    * grand total rides a broadcast one-row frame; integer micro shares
    * replay cross-engine. */
  def withDomainVerdict(census: DataFrame, blocklist: Seq[String],
                        maxShareMicro: Long): DataFrame = {
    require(maxShareMicro >= 0 && maxShareMicro <= 1000000L,
      s"withDomainVerdict: maxShareMicro=$maxShareMicro out of range")
    val total = census.agg(sum(col("n_docs")).as("__total"))
    census.crossJoin(broadcast(total))
      .withColumn("share_micro",
        expr("n_docs * 1000000L DIV greatest(__total, 1L)"))
      .withColumn("blocked", col("registered_domain").isNotNull &&
        array_contains(typedLit(blocklist), col("registered_domain")))
      .withColumn("kept",
        !col("blocked") && col("share_micro") <= maxShareMicro)
      .drop("__total")
  }

  // ── DuckDB twins ──────────────────────────────────────────────────────

  private def sqlList(xs: Seq[String]): String =
    if (xs.isEmpty) "CAST([] AS VARCHAR[])"
    else xs.map(x => s"'${x.replace("'", "''")}'").mkString("[", ",", "]")

  /** Twin of [[withUrlParts]] over a url expression: the four part
    * expressions, in (scheme, host, path, query) order. */
  def sqlUrlParts(u: String): Seq[(String, String)] = {
    val cu = s"coalesce($u, '')"
    Seq(
      "scheme" -> s"regexp_extract($cu, '$SchemeRe', 1)",
      "host" -> s"regexp_extract($cu, '$HostRe', 1)",
      "path" -> s"regexp_extract($cu, '$PathRe', 1)",
      "query" -> s"regexp_extract($cu, '\\?([^#]*)', 1)")
  }

  /** Twin of [[withCanonicalUrl]] over a url expression — one
    * expression; bind intermediates in a CTE if splicing repeatedly. */
  def sqlCanonicalUrl(u: String): String = {
    val cu = s"coalesce($u, '')"
    val scheme = s"lower(regexp_extract($cu, '$SchemeRe', 1))"
    val hostPort = s"regexp_extract($cu, " +
      "'^[a-z][a-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#]+)', 1)"
    val host = s"lower(string_split($hostPort, ':')[1])"
    val port = s"(CASE WHEN len(string_split($hostPort, ':')) > 1 " +
      s"THEN string_split($hostPort, ':')[2] END)"
    val portPart = s"(CASE WHEN $port IS NULL THEN '' " +
      s"WHEN $scheme = 'https' AND $port = '443' THEN '' " +
      s"WHEN $scheme = 'http' AND $port = '80' THEN '' " +
      s"ELSE ':' || $port END)"
    val trimmed = s"rtrim(regexp_extract($cu, '$PathRe', 1), '/')"
    val path = s"(CASE WHEN $trimmed = '' THEN '/' ELSE $trimmed END)"
    val names = TrackingParams.map(t => s"'$t'").mkString("[", ",", "]")
    val kept = s"list_sort(list_filter(" +
      s"string_split(regexp_extract($cu, '\\?([^#]*)', 1), '&'), " +
      s"p -> p <> '' AND NOT starts_with(p, '$TrackingPrefix') " +
      s"AND NOT list_contains($names, string_split(p, '=')[1])))"
    val qPart = s"(CASE WHEN len($kept) > 0 " +
      s"THEN '?' || array_to_string($kept, '&') ELSE '' END)"
    s"(CASE WHEN $scheme = '' OR $host = '' " +
      s"OR starts_with($hostPort, '[') THEN NULL " +
      s"ELSE $scheme || '://' || $host || $portPart || $path || $qPart " +
      s"END)"
  }

  /** Twin of [[withDomain]]: two SELECT-able expressions over a host
    * expression. `lblE` must be `string_split(host, '.')` bound in an
    * enclosing CTE (spliced repeatedly otherwise). */
  def sqlDomain(host: String, lbl: String,
                rules: SuffixRules = DefaultRules): Seq[(String, String)] = {
    val n = s"len($lbl)"
    def suf(k: String) =
      s"array_to_string(list_slice($lbl, $n - ($k) + 1, $n), '.')"
    val ks = s"range(1, least($n, ${rules.maxLabels}) + 1)"
    val kp = s"CAST(list_max(list_filter($ks, k -> " +
      s"list_contains(${sqlList(rules.plain)}, ${suf("k")}))) AS INT)"
    val kw = s"CAST(list_max(list_filter($ks, k -> k > 1 AND " +
      s"list_contains(${sqlList(rules.wildcard)}, " +
      s"'*.' || ${suf("k - 1")}))) AS INT)"
    val ke = s"CAST(list_max(list_filter($ks, k -> " +
      s"list_contains(${sqlList(rules.exception)}, ${suf("k")}))) AS INT)"
    val psLen = s"(CASE WHEN $ke IS NOT NULL THEN $ke - 1 " +
      s"ELSE greatest(coalesce($kp, 1), coalesce($kw, 1)) END)"
    val ok = s"($host IS NOT NULL AND length($host) > 0 " +
      s"AND NOT starts_with($host, '['))"
    Seq(
      "public_suffix" -> s"(CASE WHEN $ok THEN ${suf(psLen)} END)",
      "registered_domain" ->
        s"(CASE WHEN $ok AND $n > $psLen THEN ${suf(s"$psLen + 1")} END)")
  }
}
