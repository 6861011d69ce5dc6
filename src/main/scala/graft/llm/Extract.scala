package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Raw HTML → text extraction — the step every crawl-derived training
  * pipeline runs before any of the line/quality/dedup operators in this
  * package: C4 (Raffel et al. 2020 §2.2) and RefinedWeb (Penedo et al.
  * 2023 §3.1) both PRESUPPOSE a boilerplate-stripping extractor between
  * the WARC payload and the line rules. The reference ships documents
  * already extracted (monstache ingests BSON documents, not HTML —
  * monstache.go:2265's document pipeline starts at structured fields),
  * so this operator is part of the training-data extension surface, not
  * a port.
  *
  * The heuristics are the public boilerpipe / jusText class (Kohlschütter
  * et al. WSDM 2010; Pomikálek 2011), reduced to what replays exactly as
  * column algebra in BOTH engines (define once, emit twice — the
  * [[TextHash]] discipline):
  *
  *  1. drop `<script>`/`<style>` elements and `<!-- -->` comments whole;
  *  2. capture the `<title>` inner text, then drop the element;
  *  3. mark heading opens (`<h1>`–`<h6>`) with a sentinel so block
  *     provenance survives segmentation;
  *  4. segment on block-level tag boundaries (p, div, li, ul, ol, br,
  *     h1–h6, table/tr/td/th, header, footer, nav, section, article,
  *     blockquote, html/head/body) — inline tags (`<a>`, `<b>`,
  *     `<span>`, …) stay inside their block;
  *  5. score each block: cleaned text, word count, and LINK DENSITY
  *     (anchor-text chars ÷ block chars — the boilerpipe signal that
  *     separates nav/footer link farms from prose);
  *  6. keep headings with any text, and prose blocks with ≥ `minWords`
  *     words and link density ≤ `maxLinkDensity`; reassemble kept
  *     blocks in document order, newline-joined.
  *
  * Cleaning (step 5) is tag strip → entity decode (the five XML
  * entities + `&nbsp;`/`&#39;`, amp LAST so `&amp;lt;` doesn't
  * double-decode) → whitespace collapse → trim. Entities decode AFTER
  * tag strip, so `&lt;i&gt;` in source text stays literal `<i>` in the
  * output instead of becoming a strippable tag — the lossless order.
  *
  * Stated limits (each a documented trade for exact cross-engine
  * replay, not an accident): anchor extraction assumes non-nested `<a>`
  * elements (RE2 — the oracle engine's regex — has no backreferences,
  * so the pattern is non-greedy `<a[^>]*>(.*?)</a>`); `\s` is the ASCII
  * class both engines share; no entity decode beyond the named seven.
  * Malformed markup degrades safely: an unclosed tag strips at the next
  * `>` or acts as text, and segmentation never throws.
  *
  * Scale shape: pure per-row narrow column algebra — no shuffle, no
  * state, whole-stage codegen'd end to end; composes with [[TextAnalysis
  * .c4Clean]] (HTML → text → line rules) in the same stage. At 100 TB
  * this runs at scan speed; partition sizing is byte-based like every
  * other narrow text pass. */
object Extract {

  /** Heading sentinel injected at step 3 — a control char no text
    * corpus carries (the oracle spells it `chr(1)`). */
  val HeadMarker = "\u0001"

  /** Block-boundary tags (step 4). `h[1-6]` covers headings; `head`,
    * `html`, `body` make document chrome vanish into empty blocks. */
  private val BlockTags =
    "p|div|ul|ol|li|br|h[1-6]|table|thead|tbody|tr|td|th|header|footer" +
      "|nav|section|article|blockquote|html|head|body"

  /** The split pattern: any open OR close of a block tag, attributes
    * and all. A prefix collision (`<pre`, `<param>`) still spans to the
    * same `>` via `[^>]*`, so both engines split identically. */
  val BlockSplitRe: String = s"(?i)</?(?:$BlockTags)[^>]*>"

  /** Anchor inner text, group 1 (non-nested; see class doc). */
  val AnchorRe: String = "(?is)<a[^>]*>(.*?)</a>"

  /** Entity decode table, in application order (amp last — see class
    * doc). The marker strip rides the same chain. */
  val DecodePairs: Seq[(String, String)] = Seq(
    HeadMarker -> "",
    "&nbsp;" -> " ",
    "&lt;" -> "<",
    "&gt;" -> ">",
    "&quot;" -> "\"",
    "&#39;" -> "'",
    "&amp;" -> "&")

  /** Block/anchor text cleaning: strip tags, decode entities, collapse
    * whitespace, trim. One definition; [[sqlCleanText]] is the twin. */
  def cleanText(b: Column): Column = {
    val stripped = regexp_replace(b, "<[^>]*>", " ")
    val decoded = DecodePairs.foldLeft(stripped) { case (c, (pat, rep)) =>
      regexp_replace(c, pat, rep)
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** DuckDB twin of [[cleanText]] over a text expression. */
  def sqlCleanText(e: String): String = {
    val stripped = s"regexp_replace($e, '<[^>]*>', ' ', 'g')"
    val decoded = DecodePairs.foldLeft(stripped) { case (c, (pat, rep)) =>
      val p = if (pat == HeadMarker) "' || chr(1) || '" else pat
      s"regexp_replace($c, '$p', '${rep.replace("'", "''")}', 'g')"
    }
    s"trim(regexp_replace($decoded, '\\s+', ' ', 'g'))"
  }

  /** HTML → (title, blocks, kept text): adds `title`, `n_blocks`
    * (non-empty-text blocks), `n_kept`, and `text` (kept blocks,
    * newline-joined, document order). The input column survives
    * untouched; downstream feeds `text` to [[TextAnalysis.c4Clean]] /
    * the dedup family. */
  def htmlExtract(docs: DataFrame, htmlCol: String = "html",
                  minWords: Int = 5,
                  maxLinkDensity: Double = 0.33): DataFrame = {
    require(minWords > 0, s"htmlExtract: minWords=$minWords")
    require(maxLinkDensity > 0 && maxLinkDensity <= 1,
      s"htmlExtract: maxLinkDensity=$maxLinkDensity")
    val working = Seq("__nojunk", "__body", "__blocks", "__scored",
      "__kept", "title", "n_blocks", "n_kept", "text")
    val clash = docs.columns.toSeq.intersect(working)
    require(clash.isEmpty, s"input columns ${clash.mkString(", ")} " +
      "collide with htmlExtract working/output names — rename them")

    val raw = coalesce(col(htmlCol), lit(""))
    val noJunk = regexp_replace(
      regexp_replace(
        regexp_replace(raw, "(?is)<script[^>]*>.*?</script>", " "),
        "(?is)<style[^>]*>.*?</style>", " "),
      "(?s)<!--.*?-->", " ")
    val title = cleanText(
      regexp_extract(col("__nojunk"), "(?is)<title[^>]*>(.*?)</title>", 1))
    val body = regexp_replace(
      regexp_replace(col("__nojunk"), "(?is)<title[^>]*>.*?</title>", " "),
      "(?i)<h[1-6][^>]*>", "<p>" + HeadMarker)

    val scoreBlock = (b: Column) => struct(
      cleanText(b).as("txt"),
      b.contains(HeadMarker).as("head"),
      aggregate(regexp_extract_all(b, lit(AnchorRe), lit(1)), lit(0L),
        (acc, x) => acc + length(cleanText(x))).as("link_chars"))
    val keep = (s: Column) =>
      (s.getField("head") && length(s.getField("txt")) > 0) ||
        (size(TextHash.words(s.getField("txt"))) >= minWords &&
          s.getField("link_chars").cast("double") <=
            lit(maxLinkDensity) * length(s.getField("txt")))

    docs
      .withColumn("__nojunk", noJunk)
      .withColumn("__body", body)
      .withColumn("__blocks", split(col("__body"), BlockSplitRe, -1))
      .withColumn("__scored", transform(col("__blocks"), scoreBlock))
      .withColumn("__kept", filter(col("__scored"), keep))
      .withColumn("title", title)
      .withColumn("n_blocks",
        size(filter(col("__scored"),
          s => length(s.getField("txt")) > 0)).cast("long"))
      .withColumn("n_kept", size(col("__kept")).cast("long"))
      .withColumn("text",
        array_join(transform(col("__kept"), _.getField("txt")), "\n"))
      .drop("__nojunk", "__body", "__blocks", "__scored", "__kept")
  }

  /** Page-level crawl directives — the gate signals a crawl pipeline
    * honors BEFORE content rules: `meta_robots` (the robots meta tag's
    * content attribute), `noindex` (whether it carries the noindex
    * token — such pages must not enter a corpus), and
    * `canonical_href` (`<link rel="canonical">` — the page's OWN
    * declared dedup key, which feeds [[UrlOps.withCanonicalUrl]]-style
    * URL dedup ahead of any content hash). Empty string when absent
    * (the engines' shared no-match value). First matching tag wins.
    * Because noindex is a must-not-enter gate, the matcher fails
    * CLOSED on real-world markup variation rather than open: the tag
    * match keys on the identifying attribute (`name=robots` /
    * `rel=canonical`) appearing ANYWHERE inside the tag (so
    * `<meta content="noindex" name="robots">` — attribute order
    * reversed — still matches), and the value attribute accepts
    * double-quoted, single-quoted, and unquoted forms, preferred in
    * that order. All regexes stay RE2-safe (alternation-free tag
    * match + three quoted-form probes, no lookaround). Pure narrow
    * column algebra like the extractor. */
  def withPageDirectives(docs: DataFrame,
                         htmlCol: String = "html"): DataFrame = {
    val working = Seq("meta_robots", "noindex", "canonical_href")
    val clash = docs.columns.toSeq.intersect(working)
    require(clash.isEmpty, s"input columns ${clash.mkString(", ")} " +
      "collide with withPageDirectives output names — rename them")
    val raw = coalesce(col(htmlCol), lit(""))
    val robotsTag =
      regexp_extract(raw, "(?is)<meta[^>]*name=['\"]?robots\\b[^>]*>", 0)
    val canonTag =
      regexp_extract(raw, "(?is)<link[^>]*rel=['\"]?canonical\\b[^>]*>", 0)
    // value attribute in any quoting: double-quoted, else single-quoted,
    // else unquoted (stops at whitespace/quote/tag-end)
    def attr(tag: Column, name: String): Column = {
      val dq = regexp_extract(tag, s"(?is)$name=\"([^\"]*)\"", 1)
      val sq = regexp_extract(tag, s"(?is)$name='([^']*)'", 1)
      val uq = regexp_extract(tag, s"(?is)$name=([^\\s\"'>]+)", 1)
      when(dq =!= "", dq).when(sq =!= "", sq).otherwise(uq)
    }
    docs
      .withColumn("meta_robots", attr(robotsTag, "content"))
      .withColumn("noindex",
        lower(col("meta_robots")).contains("noindex"))
      .withColumn("canonical_href", attr(canonTag, "href"))
  }

  /** DuckDB twins of [[withPageDirectives]], in output order. */
  def sqlPageDirectives(html: String): Seq[(String, String)] = {
    val cu = s"coalesce($html, '')"
    // same fail-closed matching as the Spark side: identifying
    // attribute anywhere in the tag, any quoting on it, and the value
    // attribute probed double-quoted → single-quoted → unquoted
    def attr(tag: String, name: String): String = {
      val dq = s"regexp_extract($tag, '(?is)$name=\"([^\"]*)\"', 1)"
      val sq = s"regexp_extract($tag, '(?is)$name=''([^'']*)''', 1)"
      val uq = s"regexp_extract($tag, '(?is)$name=([^\\s\"''>]+)', 1)"
      s"(CASE WHEN $dq <> '' THEN $dq WHEN $sq <> '' THEN $sq " +
        s"ELSE $uq END)"
    }
    val robotsTag = s"regexp_extract($cu, " +
      "'(?is)<meta[^>]*name=[''\"]?robots\\b[^>]*>', 0)"
    val canonTag = s"regexp_extract($cu, " +
      "'(?is)<link[^>]*rel=[''\"]?canonical\\b[^>]*>', 0)"
    val robots = attr(robotsTag, "content")
    val canon = attr(canonTag, "href")
    Seq(
      "meta_robots" -> robots,
      "noindex" -> s"contains(lower($robots), 'noindex')",
      "canonical_href" -> canon)
  }

  // ── DuckDB twins (the oracle splices these over a CTE carrying the
  //    raw html column) ─────────────────────────────────────────────────

  /** Script/style/comment removal over an html expression. */
  def sqlNoJunk(e: String): String =
    s"""regexp_replace(regexp_replace(regexp_replace($e,
       | '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
       | '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
       | '(?s)<!--.*?-->', ' ', 'g')""".stripMargin.replaceAll("\n", "")

  /** Title inner text (cleaned) over a NOJUNK expression. */
  def sqlTitle(noJunk: String): String =
    sqlCleanText(
      s"regexp_extract($noJunk, '(?is)<title[^>]*>(.*?)</title>', 1)")

  /** Heading-marked body over a NOJUNK expression. */
  def sqlBody(noJunk: String): String =
    s"""regexp_replace(regexp_replace($noJunk,
       | '(?is)<title[^>]*>.*?</title>', ' ', 'g'),
       | '(?i)<h[1-6][^>]*>', '<p>' || chr(1), 'g')""".stripMargin
      .replaceAll("\n", "")

  /** Block list over a BODY expression. */
  def sqlBlocks(body: String): String =
    s"string_split_regex($body, '${BlockSplitRe.replace("'", "''")}')"

  /** Anchor-text char count over a block expression. */
  def sqlLinkChars(b: String): String =
    s"""coalesce(CAST(list_sum(list_transform(
       | regexp_extract_all($b, '(?is)<a[^>]*>(.*?)</a>', 1),
       | x -> length(${sqlCleanText("x")}))) AS BIGINT), 0)""".stripMargin
      .replaceAll("\n", "")

  /** The keep predicate over (txt, hd, lc) columns. */
  def sqlKeep(txt: String, hd: String, lc: String, minWords: Int,
              maxLinkDensity: Double): String =
    s"(($hd AND length($txt) > 0) OR (len(${TextHash.sqlWords(txt)}) >= " +
      s"$minWords AND CAST($lc AS DOUBLE) <= " +
      s"$maxLinkDensity * length($txt)))"
}
