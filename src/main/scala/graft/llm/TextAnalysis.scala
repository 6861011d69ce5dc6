package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextHash._

/** Text-analysis operators for training-data curation: language ID,
  * quality scoring, token counting, and content fingerprinting. Everything
  * is per-row column algebra (no shuffle; the one UDF is the rolling-hash
  * fold, whose O(1)-per-step incremental update has no column-algebra
  * form) and each heuristic has an exact SQL twin for the oracle. Ratios
  * are kept in integer form (n·threshold comparisons) so no float ever
  * reaches a hash compare.
  */
object TextAnalysis {

  /** Stopword lists per language for the n-gram/stopword-hit language ID.
    * Deterministic argmax with a fixed priority order on ties. The table
    * lives with the native scoring expression
    * ([[graft.functions.LangScores]]) — one source of truth for the
    * operator, the expression, and the oracle twins. */
  val StopWords: Seq[(String, Seq[String])] =
    graft.functions.LangScores.StopWords

  /** Per-language stopword-hit scores plus the argmax prediction
    * (priority order = declaration order on ties). Scores come from ONE
    * native pass over the token list ([[graft.functions.LangScores]]);
    * the previous form ran an interpreted `filter` + `isin` walk per
    * language. */
  def withLangId(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val scored = StopWords.map(_._1).zipWithIndex
      .foldLeft(docs.withColumn("lsc", langScores(col(textCol)))) {
        case (d, (lang, i)) =>
          d.withColumn(s"s_$lang", element_at(col("lsc"), i + 1))
      }
    val langs = StopWords.map(_._1)
    val pred = langs.init.zipWithIndex.foldRight(lit(langs.last): Column) {
      case ((lang, i), els) =>
        val rest = langs.drop(i + 1).map(l => col(s"s_$l"))
        when(col(s"s_$lang") >= (if (rest.size == 1) rest.head
                                 else greatest(rest: _*)), lang).otherwise(els)
    }
    // null text → null prediction, NOT a confident fall-through to the
    // last language: all-NULL scores fail every when() above, and without
    // the guard the otherwise() arm would label every null-text doc with
    // the table's final entry (the same null-in-null-out stance as
    // withQuality's word_chars)
    scored.withColumn("pred_lang",
      when(col("lsc").isNotNull, pred)).drop("lsc")
  }

  /** The native one-pass score vector over [[TextHash.words]] — null text
    * → null scores (each `element_at` then stays null, matching the old
    * per-language folds on a null words array). */
  private def langScores(text: Column): Column =
    call_function(graft.functions.GraftFunctions.LangScoresName, words(text))

  /** SQL twin of [[withLangId]]'s scores + argmax over a words-list
    * expression `w`. Returns (scoreSelects, predCase). */
  def sqlLangId(w: String): (Seq[String], String) = {
    def hitsSql(stop: Seq[String]) =
      s"len(list_filter($w, x -> x IN (${stop.map(s => s"'$s'").mkString(",")})))"
    val scores = StopWords.map { case (lang, stop) =>
      s"${hitsSql(stop)} AS s_$lang"
    }
    val langs = StopWords.map(_._1)
    val cases = langs.init.zipWithIndex.map { case (lang, i) =>
      val rest = langs.drop(i + 1).map(l => s"s_$l")
      val mx = if (rest.size == 1) rest.head else s"greatest(${rest.mkString(",")})"
      s"WHEN s_$lang >= $mx THEN '$lang'"
    }
    // the leading NULL arm mirrors withLangId's null-text → null
    // prediction (scores are all-NULL exactly when the words list is)
    (scores,
      s"CASE WHEN s_${langs.head} IS NULL THEN NULL " +
        s"${cases.mkString(" ")} ELSE '${langs.last}' END")
  }

  /** Quality signals in integer/boolean form: word count, character
    * totals, stopword hits (any language), and a coarse quality bucket —
    * the length/stopword-ratio heuristics of a pretraining filter. */
  def withQuality(docs: DataFrame, textCol: String = "text"): DataFrame = {
    docs.withColumn("ws", words(col(textCol)))
      .withColumn("n_words", size(col("ws")))
      .withColumn("n_chars", length(col(textCol)))
      // length-of-concatenation == sum-of-lengths, without the
      // interpreted aggregate() fold; the null guard keeps NULL text →
      // NULL (concat_ws would silently treat a null array as empty)
      .withColumn("word_chars",
        when(col("ws").isNotNull, length(concat_ws("", col("ws")))))
      // last element of the native score vector = any-language stopword
      // occurrence count (the union set, counted independently — the
      // per-language sets overlap, so it is not the per-language sum)
      .withColumn("stop_hits", element_at(
        call_function(graft.functions.GraftFunctions.LangScoresName,
          col("ws")),
        graft.functions.LangScores.NumLangs + 1))
      .withColumn("quality_bucket",
        when(col("n_words") < 20, "too_short")
          .when(col("stop_hits") * 5 >= col("n_words"), "fluent")
          .otherwise("listy"))
      .drop("ws")
  }

  /** Non-distinct word n-grams — repetition counting needs every
    * occurrence, where [[TextHash.shingles]] deliberately dedups for
    * set-Jaccard. Shorter-than-n docs have no n-gram (empty array, not a
    * padded one): a 2-word doc has zero 3-gram repetition signal. */
  private def ngramsAll(ws: Column, n: Int): Column =
    when(size(ws) >= n,
      transform(sequence(lit(0), size(ws) - n),
        i => concat_ws(" ", slice(ws, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Repetition signals (the Gopher-style repetition filters), all in
    * exact integer form so the quality decision is a pure integer
    * comparison downstream:
    *   - `n_words` / `n_distinct_words` — duplicate-word fraction
    *   - `adj_dups` — adjacent equal word pairs (stutter runs)
    *   - `n_3grams` / `top_3gram_n` — total vs most-frequent 3-gram
    *     occurrences (boilerplate phrasing)
    *   - `repetitive` — the filter verdict: the top 3-gram actually
    *     repeats (≥ 2 occurrences) AND covers ≥ 1/5 of all 3-gram slots
    *     (the occurrence floor keeps short docs, where a unique gram is
    *     already a large fraction, out of the flag)
    * Per-row column algebra over short token lists — narrow, no shuffle;
    * the per-row O(distinct·n) top-gram count is bounded by document
    * length, not corpus size, and costs nothing at the 100 TB partition
    * level (compute-dense narrow stages scale linearly). */
  def withRepetition(docs: DataFrame, textCol: String = "text",
                     n: Int = 3): DataFrame = {
    val gs = ngramsAll(col("ws"), n)
    docs.withColumn("ws", words(col(textCol)))
      .withColumn("n_words", size(col("ws")))
      .withColumn("n_distinct_words", size(array_distinct(col("ws"))))
      .withColumn("adj_dups",
        size(filter(
          zip_with(col("ws"),
            slice(col("ws"), lit(2), greatest(size(col("ws")) - 1, lit(0))),
            (a, b) => a === b),
          x => x)))
      .withColumn("__gs", gs)
      .withColumn("n_3grams", size(col("__gs")))
      .withColumn("top_3gram_n",
        coalesce(
          array_max(transform(array_distinct(col("__gs")),
            g => size(filter(col("__gs"), x => x === g)))),
          lit(0)))
      .withColumn("repetitive",
        col("top_3gram_n") >= 2 && col("top_3gram_n") * 5 >= col("n_3grams"))
      .drop("ws", "__gs")
  }

  /** SQL twin of [[ngramsAll]] over a words-list expression. */
  private def sqlNgramsAll(w: String, n: Int): String =
    s"""CASE WHEN len($w) >= $n
       | THEN list_transform(range(1, len($w) - ${n - 2}), i -> array_to_string(($w)[i:i+${n - 1}], ' '))
       | ELSE [] END""".stripMargin.replaceAll("\n", "")

  /** SQL twins of [[withRepetition]]'s signal columns over a words-list
    * expression `w`, as (alias, expression) pairs — the caller picks its
    * own casts (counts are INTs on the Spark side, so oracles usually
    * CAST to BIGINT alongside the Spark `.cast("long")`). */
  def sqlRepetition(w: String, n: Int = 3): Seq[(String, String)] = {
    val gs = sqlNgramsAll(w, n)
    val top =
      s"coalesce(list_max(list_transform(list_distinct($gs), g -> len(list_filter($gs, x -> x = g)))), 0)"
    Seq(
      "n_words" -> s"len($w)",
      "n_distinct_words" -> s"len(list_distinct($w))",
      "adj_dups" -> s"len(list_filter(range(1, len($w)), i -> ($w)[i] = ($w)[i+1]))",
      "n_3grams" -> s"len($gs)",
      "top_3gram_n" -> top,
      "repetitive" -> s"($top >= 2 AND $top * 5 >= len($gs))")
  }

  /** Canonical text normalization ahead of dedup/shingling: lowercase,
    * non-alphanumerics → space, whitespace collapsed, trimmed. Pure
    * codegen'd string ops; the standard first stage of a pretraining
    * dedup pipeline (near-dup detection over raw text misses
    * case/punctuation variants). */
  def withNormalizedText(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("norm_text",
      trim(regexp_replace(
        regexp_replace(lower(col(textCol)), "[^a-z0-9 ]", " "), " +", " ")))

  /** SQL twin of [[withNormalizedText]] (DuckDB needs the 'g' flag for
    * global replacement; Spark replaces all matches by default). */
  def sqlNormalizedText(e: String): String =
    s"trim(regexp_replace(regexp_replace(lower($e), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"

  /** Whitespace tokens vs a BPE-ish regex tokenization (letter runs,
    * digit runs, single other marks) — the token-count pair a data
    * pipeline budgets by. */
  def withTokenCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    // case-insensitive letter runs: a lowercase-only class would count
    // every uppercase letter as its own single-mark token and inflate
    // mixed-case budgets wildly
    docs.withColumn("ws_tokens", size(words(col(textCol))))
      // column form, not an expr() splice: a column name needing quoting
      // (spaces, dots) would break the SQL-string route
      .withColumn("bpe_tokens",
        size(regexp_extract_all(col(textCol),
          lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), lit(0))))

  /** Corpus vocabulary census: the k most frequent whitespace tokens with
    * their occurrence counts — the fast corpus-health readout (tokenizer
    * coverage, boilerplate tokens, encoding damage all show up at the top
    * of the list).
    *
    * Scale shape: explode is narrow, the count is one partial-aggregated
    * shuffle on the token (map-side combine collapses each partition to
    * its distinct tokens before anything moves), and the final top-k is
    * Spark's `TakeOrderedAndProject` — per-partition bounded heaps merged
    * on the driver, never a global sort of the vocabulary. Ties break on
    * the token string, so the k-th place is a total order and the cut is
    * deterministic on both engines. */
  def vocabCensus(docs: DataFrame, k: Int,
                  textCol: String = "text"): DataFrame =
    docs.select(explode(words(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(k)

  /** Per-group TF-IDF distinctive terms — "what vocabulary makes this
    * source/domain different", the standard corpus-characterization and
    * topic-skew diagnostic of a training-data audit. For each group
    * (source, domain, language shard): the top-k tokens by
    * `tf · idf_micro`, where `tf` counts the token within the group and
    * `idf_micro = floor(1e6 · ln((N+1)/(df+1)))` (df = documents
    * containing the token, N = corpus doc count). The idf floor keeps the
    * rank key an exact integer product — no float reaches the compare or
    * the hash (ln's sub-grid ulp wobble aside, documented in
    * [[LangModel]]).
    *
    * Scale shape: tf is one map-side-combined count over the exploded
    * corpus; df explodes DISTINCT tokens per doc (`array_distinct` prunes
    * in place before anything moves) and counts — both shuffle token-keyed,
    * never doc-keyed. N rides along as a broadcast 1-row frame. The final
    * per-group top-k is a `row_number` window over the post-aggregation
    * (group, token, score) rows — group-cardinality × vocabulary rows of
    * three scalar columns, nothing carrying document payload (the shape
    * the Similarity rank windows were rebuilt to avoid is heavy-payload
    * pre-aggregation rows; this window ranks the already-collapsed
    * aggregate). Ties break on the token string so the cut is a total
    * order on both engines. */
  def distinctiveTerms(docs: DataFrame, k: Int,
                       groupCol: String = "source",
                       idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val tok = docs.select(col(groupCol), col(idCol),
      words(col(textCol)).as("ws"))
    val tf = tok.select(col(groupCol), explode(col("ws")).as("token"))
      .groupBy(groupCol, "token").agg(count(lit(1)).as("tf"))
    // countDistinct, not count: the per-doc array_distinct already
    // yields one row per (doc-row, token), but an input carrying the
    // same doc_id twice (unioned overlapping slices) must still count
    // the document once — the SQL twin's count(DISTINCT doc_id)
    val df = tok
      .select(col(idCol), explode(array_distinct(col("ws"))).as("token"))
      .groupBy("token").agg(countDistinct(col(idCol)).as("df"))
    val scored = tf.join(df, "token").crossJoin(broadcast(nDocs))
      .withColumn("idf_micro",
        floor(lit(1e6) * log((col("n_docs") + 1).cast("double") /
          (col("df") + 1))).cast("long"))
      .withColumn("score_micro", col("tf") * col("idf_micro"))
    scored
      .withColumn("rk", row_number().over(
        Window.partitionBy(groupCol)
          .orderBy(col("score_micro").desc, col("token").asc)))
      .filter(col("rk") <= k)
      .select(col(groupCol), col("token"), col("tf"), col("score_micro"))
  }

  /** Content fingerprints: `fp_min` = min hashed shingle (winnowing-style
    * content fingerprint, stable under word reorder outside the window)
    * and `fp_pos` = position-weighted word-hash sum mod P (order
    * sensitive). */
  def withFingerprint(docs: DataFrame, textCol: String = "text",
                      shingleN: Int = 4): DataFrame =
    docs.withColumn("ws", words(col(textCol)))
      .withColumn("fp_min",
        array_min(hashedShingles(shingles(col("ws"), shingleN))))
      // one native digest-and-accumulate pass (the HOF form ran two
      // interpreted lambdas per word); bit-parity with the old
      // aggregate/transform fold is pinned by WordsSpec
      .withColumn("fp_pos",
        call_function(graft.functions.GraftFunctions.PosFpName, col("ws")))
      .drop("ws")

  /** Rabin-Karp rolling-hash winnowing: polynomial window hash
    * H_i = (Σ h(word_{i+j})·B^{w-1-j}) mod P over a sliding w-word
    * window, updated incrementally in O(1) per step — O(n) per doc
    * total, vs O(n·w) for recomputing windows — and the fingerprint is
    * the minimum window hash. Integer mod arithmetic, so the incremental
    * update is EXACTLY the direct polynomial (no float drift) and the
    * oracle can recompute windows directly. Shorter-than-w docs hash
    * their full word list as one window. */
  val RollB = 31L
  val RollW = 4

  private val rollUdf = udf { (ws: Seq[String]) =>
    // one digest per row, reset per word; the 32-bit prefix is built
    // numerically from the first 4 digest bytes — identical to parsing
    // the first 8 hex chars, without the per-word provider lookup and
    // hex round-trip. A NULL word list (null text) must not NPE the
    // whole job: it fingerprints like the empty document.
    val md = java.security.MessageDigest.getInstance("MD5")
    def h32p(s: String): Long = {
      md.reset()
      h32pBytes(md.digest(s.getBytes("UTF-8")))
    }
    val hs = if (ws == null) Array.empty[Long] else ws.map(h32p).toArray
    val n = hs.length
    if (n == 0) (0L, 0L)
    else if (n < RollW) {
      // one window over everything: Σ h_j · B^{n-1-j}
      var h = 0L
      hs.foreach { x => h = (h * RollB + x) % P }
      (h, 1L)
    } else {
      val topPow = { var p = 1L; (1 until RollW).foreach(_ => p = p * RollB % P); p }
      var h = 0L
      (0 until RollW).foreach { j => h = (h * RollB + hs(j)) % P }
      var minH = h
      var i = 1
      while (i + RollW - 1 < n) {
        var t = (h - hs(i - 1) * topPow % P) % P
        if (t < 0) t += P
        h = (t * RollB + hs(i + RollW - 1)) % P
        if (h < minH) minH = h
        i += 1
      }
      (minH, (n - RollW + 1).toLong)
    }
  }

  /** fp_roll = min rolling-window hash; n_windows = window count. */
  def withRollingFingerprint(docs: DataFrame,
                             textCol: String = "text"): DataFrame =
    docs.withColumn("__rw", rollUdf(words(col(textCol))))
      .withColumn("fp_roll", col("__rw._1"))
      .withColumn("n_windows", col("__rw._2"))
      .drop("__rw")

  /** SQL twin: direct polynomial per window (the incremental update is
    * arithmetically identical in exact integer mod math). */
  def sqlRollingFp(w: String): String = {
    val b1 = RollB % P
    val b2 = RollB * RollB % P
    val b3 = RollB * RollB * RollB % P
    val hs = s"list_transform($w, x -> ${TextHash.sqlH32p("x")})"
    s"""CASE WHEN len($w) = 0 THEN 0
       | WHEN len($w) = 1 THEN (($hs)[1]) % $P
       | WHEN len($w) = 2 THEN (($hs)[1]*$b1 + ($hs)[2]) % $P
       | WHEN len($w) = 3 THEN (($hs)[1]*$b2 + ($hs)[2]*$b1 + ($hs)[3]) % $P
       | ELSE list_min(list_transform(range(1, len($w) - ${RollW - 2}), i ->
       |   (($hs)[i]*$b3 + ($hs)[i+1]*$b2 + ($hs)[i+2]*$b1 + ($hs)[i+3]) % $P))
       | END""".stripMargin.replaceAll("\n", "")
  }

  /** SQL twin of the window count. */
  def sqlRollingWindows(w: String): String =
    s"CASE WHEN len($w) = 0 THEN 0 WHEN len($w) < $RollW THEN 1 ELSE len($w) - ${RollW - 1} END"

  /** SQL twin of `fp_pos` over a words-list expression (1-based index).
    * The empty arm matters: DuckDB `list_sum([])` is NULL where Spark's
    * 0-seeded aggregate returns 0 — same convention as [[sqlRollingFp]]. */
  def sqlFpPos(w: String): String =
    s"""CASE WHEN len($w) = 0 THEN 0
       | ELSE CAST(list_sum(list_transform($w, (x, i) ->
       | (${TextHash.sqlH32p("x")}) * (((i - 1) % 64) + 1))) AS BIGINT) % $P END""".stripMargin.replaceAll("\n", "")

  // ── C4 line rules ─────────────────────────────────────────────────────

  /** Page-level kill terms (case-insensitive substring): a page carrying
    * one is dropped whole. The published C4 set's portable core. */
  val C4PageBlock: Seq[String] = Seq("lorem ipsum", "{")

  /** Line-level kill terms (case-insensitive substring). */
  val C4LineBlock: Seq[String] = Seq("javascript")

  /** The C4 cleaning heuristics (Raffel et al. 2020, §2.2): keep only
    * lines that end in terminal punctuation (`.` `!` `?` `"`), have at
    * least `minLineWords` words, and carry no line-block term; drop the
    * whole page if it contains a page-block term or retains fewer than
    * `minKeptLines` lines. One row per input doc —
    * (…, text_clean, n_lines, n_kept, page_kept) — so rejected pages
    * stay visible to QA instead of vanishing (`filter(col("page_kept"))`
    * is the pipeline move).
    *
    * Purely narrow: line split, per-line predicates, and reassembly are
    * all per-row column algebra over the line list — no shuffle, no
    * state, batch ≡ streaming by construction. NULL text reads as one
    * empty line (kept 0 → page dropped), the total-function convention. */
  def c4Clean(docs: DataFrame, textCol: String = "text",
              minLineWords: Int = 3, minKeptLines: Int = 3): DataFrame = {
    val lines = split(coalesce(col(textCol), lit("")), "\n", -1)
    val keepLine = (l: Column) => {
      val blocked = C4LineBlock
        .map(t => lower(l).contains(t))
        .reduce(_ || _)
      l.rlike("[.!?\"]$") &&
        size(TextHash.words(l)) >= minLineWords && !blocked
    }
    val pageBlocked = C4PageBlock
      .map(t => lower(coalesce(col(textCol), lit(""))).contains(t))
      .reduce(_ || _)
    docs
      .withColumn("__lines", lines)
      .withColumn("__kept", filter(col("__lines"), keepLine))
      .withColumn("n_lines", size(col("__lines")).cast("long"))
      .withColumn("n_kept", size(col("__kept")).cast("long"))
      .withColumn("text_clean", array_join(col("__kept"), "\n"))
      .withColumn("page_kept",
        !pageBlocked && col("n_kept") >= minKeptLines)
      .drop("__lines", "__kept")
  }

  /** DuckDB twin of [[c4Clean]]'s kept-line list over a text
    * expression. */
  def sqlC4Kept(text: String, minLineWords: Int): String = {
    val lineOk = C4LineBlock
      .map(t => s"NOT contains(lower(l), '$t')").mkString(" AND ")
    s"""list_filter(string_split(coalesce($text, ''), chr(10)),
       | l -> regexp_matches(l, '[.!?"]${"$"}')
       |  AND len(${TextHash.sqlWords("l")}) >= $minLineWords
       |  AND $lineOk)""".stripMargin.replaceAll("\n", "")
  }

  /** DuckDB twin of the page-block predicate. */
  def sqlC4PageBlocked(text: String): String =
    C4PageBlock
      .map(t => s"contains(lower(coalesce($text, '')), '${t.replace("'", "''")}')")
      .mkString("(", " OR ", ")")

  // ── Gopher quality rules ──────────────────────────────────────────────

  /** Gopher's required stop words (Rae et al. 2021, table A1): a page
    * must contain at least two DISTINCT members. */
  val GopherStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The Gopher document-quality gates (Rae et al. 2021, §A.1.1) in
    * exact integer form — every fraction a micro-integer
    * (`x·10⁶ DIV total`, totals floored at 1 so empty docs read 0, not
    * NULL), so the verdict is a pure integer comparison both engines
    * hash identically:
    *
    *  - `n_words` ∈ [50, 100000]
    *  - mean word length ∈ [3, 10] characters
    *  - symbol-to-word ratio (`#` and `...`) ≤ 0.1
    *  - ≤ 90% of lines start with a bullet (`-` or `•`)
    *  - ≤ 30% of lines end with an ellipsis (`...`)
    *  - ≥ 80% of words contain an alphabetic character
    *  - ≥ 2 distinct [[GopherStops]] present
    *
    * All per-row narrow column algebra (the [[withQuality]] /
    * [[withRepetition]] class — at 100 TB this is a compute-dense narrow
    * stage, zero shuffle). The repetition gates of the same paper are
    * [[withRepetition]]; this is the length/symbol/stop-word half. */
  def gopherQuality(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val ws = TextHash.words(col(textCol))
    val nw = coalesce(size(ws), lit(0)).cast("long")
    val nwFloor = greatest(nw, lit(1L))
    val wordChars =
      coalesce(length(concat_ws("", ws)), lit(0)).cast("long")
    val hashes = (length(t) - length(regexp_replace(t, "#", ""))).cast("long")
    val ellipsisChars =
      (length(t) - length(regexp_replace(t, "\\.\\.\\.", ""))).cast("long")
    val lines = split(t, "\n", -1)
    val nl = greatest(size(lines), lit(1)).cast("long")
    val bulletLines = size(filter(lines,
      l => l.startsWith("-") || l.startsWith("•"))).cast("long")
    val ellipsisLines = size(filter(lines, l => l.endsWith("..."))).cast("long")
    val alphaWords = coalesce(
      size(filter(ws, w => w.rlike("[a-zA-Z]"))), lit(0)).cast("long")
    val reqStops = GopherStops
      .map(sw => array_contains(ws, sw).cast("long"))
      .reduce(_ + _)
    docs
      .withColumn("n_words", nw)
      .withColumn("__nwf", nwFloor)
      .withColumn("__wc", wordChars)
      .withColumn("__sym", hashes)
      .withColumn("__ed", ellipsisChars)
      .withColumn("__nl", nl)
      .withColumn("__bl", bulletLines)
      .withColumn("__el", ellipsisLines)
      .withColumn("__aw", alphaWords)
      // all shares in nonnegative truncating integer division (DIV — the
      // cross-engine contract; `/` would be double division)
      .withColumn("mwl_micro", expr("__wc * 1000000L DIV __nwf"))
      .withColumn("sym_micro",
        expr("(__sym + (__ed DIV 3L)) * 1000000L DIV __nwf"))
      .withColumn("bullet_micro", expr("__bl * 1000000L DIV __nl"))
      .withColumn("ellipsis_micro", expr("__el * 1000000L DIV __nl"))
      .withColumn("alpha_micro", expr("__aw * 1000000L DIV __nwf"))
      .withColumn("req_stops", coalesce(reqStops, lit(0L)))
      .withColumn("gopher_kept",
        col("n_words") >= 50 && col("n_words") <= 100000 &&
          col("mwl_micro") >= 3000000L && col("mwl_micro") <= 10000000L &&
          col("sym_micro") <= 100000L &&
          col("bullet_micro") <= 900000L &&
          col("ellipsis_micro") <= 300000L &&
          col("alpha_micro") >= 800000L &&
          col("req_stops") >= 2L)
      .drop("__nwf", "__wc", "__sym", "__ed", "__nl", "__bl", "__el", "__aw")
  }

  /** DuckDB twin of [[gopherQuality]]'s signal columns over `(text)` —
    * the SELECT-list fragments, given a words-list expression `w`. */
  def sqlGopherSignals(text: String, w: String): Seq[String] = {
    val t = s"coalesce($text, '')"
    val nw = s"coalesce(len($w), 0)"
    val nwF = s"greatest($nw, 1)"
    val nl = s"greatest(len(string_split($t, chr(10))), 1)"
    val stops = GopherStops
      .map(sw => s"CASE WHEN list_contains($w, '$sw') THEN 1 ELSE 0 END")
      .mkString(" + ")
    Seq(
      s"CAST($nw AS BIGINT) AS n_words",
      s"CAST(coalesce(CASE WHEN len($w) = 0 THEN 0 ELSE CAST(list_sum(list_transform($w, x -> length(x))) AS BIGINT) END, 0) * 1000000 // $nwF AS BIGINT) AS mwl_micro",
      s"CAST(((length($t) - length(replace($t, '#', ''))) + (length($t) - length(replace($t, '...', ''))) // 3) * 1000000 // $nwF AS BIGINT) AS sym_micro",
      s"CAST(len(list_filter(string_split($t, chr(10)), l -> starts_with(l, '-') OR starts_with(l, '•'))) * 1000000 // $nl AS BIGINT) AS bullet_micro",
      s"CAST(len(list_filter(string_split($t, chr(10)), l -> ends_with(l, '...'))) * 1000000 // $nl AS BIGINT) AS ellipsis_micro",
      s"CAST(coalesce(len(list_filter($w, x -> regexp_matches(x, '[a-zA-Z]'))), 0) * 1000000 // $nwF AS BIGINT) AS alpha_micro",
      s"CAST($stops AS BIGINT) AS req_stops")
  }

  /** DuckDB twin of the verdict over the signal column names. */
  val sqlGopherKept: String =
    """(n_words >= 50 AND n_words <= 100000
      | AND mwl_micro >= 3000000 AND mwl_micro <= 10000000
      | AND sym_micro <= 100000
      | AND bullet_micro <= 900000
      | AND ellipsis_micro <= 300000
      | AND alpha_micro >= 800000
      | AND req_stops >= 2)""".stripMargin.replaceAll("\n", "")

  // ── Lexical diversity ─────────────────────────────────────────────────

  /** Lexical-diversity quality signals — the vocabulary-concentration
    * complement of [[withRepetition]] (which detects STRUCTURED repeats:
    * stutters, repeated n-grams). A spam page cycling a small vocabulary
    * in varying order defeats n-gram gates but cannot hide its
    * distribution; these three distribution signals catch it:
    *
    *  - `ttr_micro` — type-token ratio: distinct words · 10⁶ DIV words.
    *  - `hapax_micro` — hapax-legomenon share: words occurring exactly
    *    once · 10⁶ DIV words (natural prose ≳ 40%; template spam ≈ 0).
    *  - `went_micro` — word-distribution Shannon entropy in micro-nats:
    *    Σ_w n_w·⌊10⁶·ln(N/n_w)⌋ DIV N. `ln` is the one engine-approximate
    *    op (the q77 contract): each term floors to an integer BEFORE the
    *    order-free sum, so a cross-engine flip needs the two libms to
    *    disagree across a floor boundary — ~10⁻¹⁰ per term.
    *
    * Verdict `lex_kept` = non-empty ∧ ttr ≥ minTtrMicro ∧ entropy ≥
    * minEntMicro. The default entropy floor of 1.5 nats is an effective
    * vocabulary of e^1.5 ≈ 4.5 words — which also kills 1–3-word stubs by
    * design (their entropy cannot reach 1.5 nats); the word-COUNT floor
    * itself is [[gopherQuality]]'s gate, not this one's.
    *
    * All per-row narrow column algebra: the per-distinct-word count scan
    * is O(distinct·words) inside one row — bounded by doc length, zero
    * shuffle, the [[withQuality]] scale class. NULL text ≡ empty text
    * (all-zero signals, kept = false), stated rather than ridden on
    * size(NULL) session config. */
  def lexicalDiversity(docs: DataFrame, textCol: String = "text",
                       minTtrMicro: Long = 100000L,
                       minEntMicro: Long = 1500000L): DataFrame = {
    val ws = coalesce(TextHash.words(col(textCol)),
      array().cast("array<string>"))
    docs
      .withColumn("__ws", ws)
      .withColumn("n_words", size(col("__ws")).cast("long"))
      .withColumn("__nwf", greatest(col("n_words"), lit(1L)))
      .withColumn("__cnts", transform(array_distinct(col("__ws")),
        w => size(filter(col("__ws"), x => x === w)).cast("long")))
      .withColumn("ttr_micro", expr("size(__cnts) * 1000000L DIV __nwf"))
      .withColumn("hapax_micro",
        expr("size(filter(__cnts, c -> c = 1L)) * 1000000L DIV __nwf"))
      .withColumn("went_micro",
        expr("aggregate(__cnts, 0L, (acc, c) -> acc + c * " +
          "CAST(floor(1000000D * ln(CAST(n_words AS DOUBLE) / c)) AS BIGINT))" +
          " DIV __nwf"))
      .withColumn("lex_kept",
        col("n_words") > 0L && col("ttr_micro") >= minTtrMicro &&
          col("went_micro") >= minEntMicro)
      .drop("__ws", "__nwf", "__cnts")
  }

  /** DuckDB twin of [[lexicalDiversity]]'s signal columns, given a words
    * list expression `w` (assumed non-NULL — coalesce at the call site
    * mirrors the operator's NULL≡empty branch). */
  def sqlLexicalDiversity(w: String): Seq[String] = {
    val nwF = s"greatest(coalesce(len($w), 0), 1)"
    val cnts =
      s"list_transform(list_distinct($w), x -> len(list_filter($w, y -> y = x)))"
    Seq(
      s"CAST(coalesce(len($w), 0) AS BIGINT) AS n_words",
      s"CAST(len(list_distinct($w)) * 1000000 // $nwF AS BIGINT) AS ttr_micro",
      s"CAST(len(list_filter($cnts, c -> c = 1)) * 1000000 // $nwF AS BIGINT) AS hapax_micro",
      s"CAST(coalesce(list_sum(list_transform($cnts, c -> c * " +
        s"CAST(floor(1000000 * ln(CAST(coalesce(len($w), 0) AS DOUBLE) / c)) AS BIGINT))), 0) " +
        s"// $nwF AS BIGINT) AS went_micro")
  }

  /** DuckDB twin of the verdict over the signal column names (default
    * thresholds). */
  val sqlLexKept: String =
    "(n_words > 0 AND ttr_micro >= 100000 AND went_micro >= 1500000)"

  // ── Language purity (code-switching detection) ────────────────────────

  /** Mixed-language detection: chunk the document into non-overlapping
    * `chunkWords`-word windows, language-ID each chunk with the SAME
    * stopword argmax as [[withLangId]], and report how much of the doc
    * agrees with its own document-level prediction. A page that
    * interleaves two languages fools the doc-level argmax (one language
    * simply outvotes the other) but not the chunk distribution — the
    * standard curation gate for code-switched or template-injected
    * pages. Returns (idCol, doc_lang, n_chunks, n_agree, purity_micro,
    * n_langs, mixed) where `mixed` = more than one chunk language AND
    * purity below `minPurityMicro`. Docs with no words carry NULL
    * doc_lang, zero chunks, and `mixed = false` (no evidence is not
    * evidence of mixing).
    *
    * Scale shape: one narrow chunk explode (positions are column
    * algebra, [[Chunking.withChunks]]), the chunk langid is the same
    * one-pass native score vector, and the rollup is one doc-keyed
    * map-side-combined aggregation; the doc-level langid is a second
    * narrow pass. No corpus-global state anywhere. */
  def langPurity(docs: DataFrame, chunkWords: Int = 16,
                 minPurityMicro: Long = 800000L,
                 idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    val doc = withLangId(docs, textCol)
      .select(col(idCol), col("pred_lang").as("doc_lang"))
    val chunks = Chunking.withChunks(
      docs.select(col(idCol), col(textCol)), chunkWords, chunkWords,
      idCol, textCol)
    val perChunk = withLangId(chunks, "chunk_text")
      .select(col(idCol), col("pred_lang").as("__cl"))
    val agg = perChunk.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_chunks"),
        countDistinct(col("__cl")).as("n_langs"))
    val agree = perChunk.join(doc, Seq(idCol))
      .filter(col("__cl") === col("doc_lang"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_agree"))
    doc.join(agg, Seq(idCol), "left").join(agree, Seq(idCol), "left")
      .select(col(idCol), col("doc_lang"),
        coalesce(col("n_chunks"), lit(0L)).as("n_chunks"),
        coalesce(col("n_agree"), lit(0L)).as("n_agree"),
        coalesce(col("n_langs"), lit(0L)).as("n_langs"))
      .withColumn("purity_micro",
        expr("n_agree * 1000000L DIV greatest(n_chunks, 1L)"))
      .withColumn("mixed",
        col("n_langs") > 1L && col("purity_micro") < minPurityMicro)
  }
}
