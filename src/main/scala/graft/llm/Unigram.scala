package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) subword tokenizer — the
  * probabilistic sibling of [[Bpe]]: seed a candidate vocabulary from
  * the word census's substrings, Viterbi-segment every census word
  * under integer micro-nat piece costs, re-estimate counts from usage
  * (EM), prune to the kept vocabulary, and segment with the result
  * (Kudo 2018, "Subword Regularization" §3 — the argmax/prune half;
  * sampling is out of scope, stated).
  *
  * Determinism across engines, the [[LangModel]] recipe: piece costs
  * are `floor(1e6 · ln(total/count))` integer micro-nats, the Viterbi
  * DP runs entirely on integers with the combined encoding
  * `score·32 + j` (j = the chosen split start, < 32 ≥ maxWordLen, so
  * min(combined) is min score THEN min j — ties prefer the longer
  * final piece), and every prune orders (count DESC, piece ASC).
  *
  * Scale shape, the [[Bpe.wordCensus]] discipline: the ONE corpus-
  * sized pass is the word census; seeding, EM, and pruning are
  * vocab-census-sized aggregations; the vocabulary itself is
  * config-sized BY CONSTRUCTION (all corpus characters + a bounded
  * multi-char slice), which is what licenses the driver-side collect
  * that turns it into a plan-literal map (the BPE merge-table
  * argument); segmentation is a narrow per-word fold — documents only
  * ever pay a words→census join. */
object Unigram {

  /** Tokenizer shape: candidate pieces up to `maxPieceLen` chars,
    * census words truncated to `maxWordLen` (must stay < 32 for the
    * combined DP encoding), `nSeedMulti` multi-char seeds in, and
    * `nKeepMulti` kept after each EM prune. */
  final case class Params(maxPieceLen: Int = 4, maxWordLen: Int = 16,
                          nSeedMulti: Int = 24, nKeepMulti: Int = 16) {
    require(maxWordLen < 32, s"maxWordLen=$maxWordLen must be < 32 " +
      "(the combined DP encoding packs the split index into 5 bits)")
    require(maxPieceLen >= 1 && nSeedMulti >= 0 && nKeepMulti >= 0,
      s"Params($maxPieceLen, $maxWordLen, $nSeedMulti, $nKeepMulti)")
  }

  /** Unreachable-position sentinel score (belt-and-braces: every
    * corpus character is in the vocabulary, so census words are always
    * reachable; a foreign-alphabet word at apply time degrades to a
    * clamped cost instead of a NULL walk). */
  val Unreach = 1000000000000000L

  /** Truncate a `(w, n)` census to `maxWordLen` chars and re-group. */
  def truncCensus(census: DataFrame, maxWordLen: Int): DataFrame =
    census.select(substring(col("w"), 1, maxWordLen).as("w"), col("n"))
      .groupBy("w").agg(sum(col("n")).as("n"))

  /** All substring pieces (length 1..maxPieceLen, every start, overlaps
    * counted) of a truncated census, frequency-weighted:
    * `(piece, cnt)`. */
  def substringCensus(census: DataFrame, p: Params): DataFrame = {
    val pieces = flatten(transform(sequence(lit(1), lit(p.maxPieceLen)),
      l => when(length(col("w")) >= l,
        transform(sequence(lit(1), length(col("w")) - l + 1),
          s0 => col("w").substr(s0, l)))
        .otherwise(array().cast("array<string>"))))
    census.select(col("n"), explode(pieces).as("piece"))
      .groupBy("piece").agg(sum(col("n")).as("cnt"))
  }

  /** Seed vocabulary: ALL single characters (the coverage guarantee)
    * plus the top `nSeedMulti` multi-char substrings by
    * (cnt DESC, piece ASC). */
  def seedVocab(census: DataFrame, p: Params): DataFrame = {
    val subs = graft.CacheBarriers.barrier(substringCensus(census, p))
    val chars = subs.filter(length(col("piece")) === 1)
    val multi = subs.filter(length(col("piece")) >= 2)
      .orderBy(col("cnt").desc, col("piece").asc).limit(p.nSeedMulti)
    chars.unionByName(multi)
  }

  /** Micro-nat costs over a `(piece, cnt)` vocabulary:
    * `floor(1e6 · ln(total/cnt))` — one broadcast total. */
  def withCosts(vocab: DataFrame): DataFrame = {
    val t = vocab.agg(sum(col("cnt")).as("__t"))
    vocab.crossJoin(broadcast(t))
      .withColumn("cost_micro",
        floor(lit(1e6) * log(col("__t").cast("double") / col("cnt")))
          .cast("long"))
      .drop("__t")
  }

  /** The config-sized collect (bounded by |alphabet| + nSeed/nKeep —
    * the BPE merge-table argument): piece → cost. */
  def collectVocab(vocab: DataFrame): Map[String, Long] =
    vocab.select("piece", "cost_micro").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  /** Viterbi DP as a pure column fold: `best[i]` (1-indexed position
    * i = 0..len) carries the combined encoding. Shared algorithm with
    * the oracle's recursive CTE ([[sqlDpCte]]). */
  private def dpCol(w: String, vmap: String, p: Params): Column = expr(
    s"""aggregate(sequence(1, length($w)), array(0L), (acc, i) ->
       |  concat(acc, array(coalesce(
       |    array_min(filter(transform(
       |      sequence(greatest(i - ${p.maxPieceLen}, 0), i - 1),
       |      j -> CASE WHEN element_at($vmap,
       |                    substring($w, j + 1, i - j)) IS NOT NULL
       |           THEN (element_at(acc, j + 1) DIV 32 +
       |                 element_at($vmap, substring($w, j + 1, i - j)))
       |                * 32 + j END),
       |      x -> x IS NOT NULL)),
       |    ${Unreach}L * 32L))))""".stripMargin.replaceAll("\n", " "))

  /** Backwalk: decode the split chain from `best` into the piece list
    * (document order). */
  private def walkCol(w: String, best: String, p: Params): Column = expr(
    s"""aggregate(sequence(1, ${p.maxWordLen}),
       |  named_struct('pos', length($w),
       |               'ps', CAST(array() AS array<string>)),
       |  (st, u) -> CASE WHEN st.pos > 0 THEN named_struct(
       |    'pos', CAST(element_at($best, st.pos + 1) % 32 AS INT),
       |    'ps', concat(array(substring($w,
       |            CAST(element_at($best, st.pos + 1) % 32 AS INT) + 1,
       |            st.pos - CAST(element_at($best, st.pos + 1) % 32
       |                          AS INT))), st.ps))
       |    ELSE st END).ps""".stripMargin.replaceAll("\n", " "))

  /** Segment a truncated census under a collected vocabulary:
    * `(w, n, ps)` with `ps` the Viterbi piece list.
    *
    * ONE native pass per word ([[graft.functions.UnigramViterbi]] —
    * DP + backwalk fused, vocabulary in a hash-map reference object).
    * The previous column form ([[dpCol]] + [[walkCol]], kept below as
    * the documented algorithm and UnigramViterbiSpec's parity
    * reference) carried the vocabulary as a ~90-entry map LITERAL in
    * the plan (q226's one-EM-round train replay analyzed to 240 KB of
    * plan text) and paid a LINEAR `element_at` map scan per DP
    * candidate; the native pass is O(len · maxPieceLen) with O(1)
    * lookups and a config-sized plan. Same combined `score·32 + j`
    * encoding, same tie-breaks, bit-identical pieces — the DuckDB
    * recursive-CTE twin is untouched. */
  def segmentCensus(census: DataFrame, vocab: Map[String, Long],
                    p: Params): DataFrame = {
    val (ks, vs) = vocab.toSeq.sortBy(_._1).unzip
    census.withColumn("ps",
      call_function(graft.functions.GraftFunctions.UnigramViterbiName,
        col("w"), typedLit(ks), typedLit(vs),
        lit(p.maxPieceLen), lit(p.maxWordLen)))
  }

  /** The replaced column-form segmentation — [[segmentCensus]]'s
    * algorithm as the `dpCol`/`walkCol` expression stack. Retained as
    * executable documentation and as UnigramViterbiSpec's parity
    * reference; not used on any query path. */
  private[graft] def segmentCensusColumnForm(census: DataFrame,
                                             vocab: Map[String, Long],
                                             p: Params): DataFrame = {
    val (ks, vs) = vocab.toSeq.sortBy(_._1).unzip
    census
      .withColumn("__vm", map_from_arrays(typedLit(ks), typedLit(vs)))
      .withColumn("__best", dpCol("w", "__vm", p))
      .withColumn("ps", walkCol("w", "__best", p))
      .drop("__vm", "__best")
  }

  /** One EM round: usage counts from Viterbi segmentation
    * (`(piece, u)`, frequency-weighted). */
  def usageCounts(census: DataFrame, vocab: Map[String, Long],
                  p: Params): DataFrame =
    segmentCensus(census, vocab, p)
      .select(col("n"), explode(col("ps")).as("piece"))
      .groupBy("piece").agg(sum(col("n")).as("u"))

  /** M-step + prune: every seed character survives with add-one
    * smoothed usage; multi-char pieces keep the top `nKeepMulti` by
    * (usage DESC, piece ASC) among those actually used. */
  def prune(chars: DataFrame, usage: DataFrame, p: Params): DataFrame = {
    val c = chars.select("piece")
      .join(usage, Seq("piece"), "left")
      .select(col("piece"), (coalesce(col("u"), lit(0L)) + 1L).as("cnt"))
    val m = usage.filter(length(col("piece")) >= 2 && col("u") > 0)
      .orderBy(col("u").desc, col("piece").asc).limit(p.nKeepMulti)
      .select(col("piece"), (col("u") + 1L).as("cnt"))
    c.unionByName(m)
  }

  /** Train: seed → `rounds` × (E-step, M-step/prune). Returns the
    * final `(piece, cnt, cost_micro)` vocabulary. */
  def train(census: DataFrame, p: Params, rounds: Int): DataFrame = {
    require(rounds >= 1, s"train: rounds=$rounds")
    val wtr = graft.CacheBarriers.barrier(truncCensus(census, p.maxWordLen))
    val seed = graft.CacheBarriers.barrier(withCosts(seedVocab(wtr, p)))
    val chars = seed.filter(length(col("piece")) === 1)
    var vocab = seed
    for (_ <- 1 to rounds)
      vocab = withCosts(prune(chars, usageCounts(wtr, collectVocab(vocab),
        p), p))
    vocab
  }

  /** Segment documents under a trained vocabulary via the census join
    * (distinct words segment once): per doc `n_words`, `n_pieces`,
    * and `seg` — pieces joined `+` within a word, words joined by
    * spaces in document order. Only census-eligible words
    * (`[a-z0-9]+`, truncated) count; docs with none are absent. */
  def segmentDocs(docs: DataFrame, seg: DataFrame, p: Params,
                  idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    val words = docs.select(col(idCol),
        posexplode(TextHash.words(col(textCol))).as(Seq("pos", "w0")))
      .filter(col("w0").rlike("^[a-z0-9]+$"))
      .select(col(idCol), col("pos"),
        substring(col("w0"), 1, p.maxWordLen).as("w"))
    words.join(seg.select(col("w"), col("ps")), Seq("w"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(size(col("ps"))).as("n_pieces"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"),
            array_join(col("ps"), "+").as("pw")))),
          s => s.getField("pw")), " ").as("seg"))
  }

  // ── DuckDB twins ──────────────────────────────────────────────────────

  /** Census + truncation CTEs over `documents` → `wtr(w, n)`. */
  def sqlCensusCtes(p: Params): String = {
    val ws = TextHash.sqlWords("text")
    s"""wc0 AS (SELECT unnest($ws) AS w FROM documents),
       |wc1 AS (SELECT w, count(*) AS n FROM wc0
       |        WHERE regexp_matches(w, '^[a-z0-9]+$$') GROUP BY w),
       |wtr AS (SELECT substr(w, 1, ${p.maxWordLen}) AS w,
       |          CAST(sum(n) AS BIGINT) AS n
       |        FROM wc1 GROUP BY substr(w, 1, ${p.maxWordLen}))"""
      .stripMargin
  }

  /** Substring census + seed + costs over `wtr` →
    * `v0c(piece, cnt, cost_micro)` and `chars0(piece, cnt)`. */
  def sqlSeedCtes(p: Params): String =
    s"""subs AS (
       |  SELECT piece, CAST(sum(n) AS BIGINT) AS cnt FROM (
       |    SELECT n, unnest(flatten(list_transform(
       |      range(1, ${p.maxPieceLen + 1}), l ->
       |      CASE WHEN length(w) >= l THEN list_transform(
       |             range(1, length(w) - l + 2), s -> substr(w, s, l))
       |           ELSE CAST([] AS VARCHAR[]) END))) AS piece
       |    FROM wtr) GROUP BY piece),
       |chars0 AS (SELECT piece, cnt FROM subs WHERE length(piece) = 1),
       |multi0 AS (SELECT piece, cnt FROM subs WHERE length(piece) >= 2
       |           ORDER BY cnt DESC, piece ASC LIMIT ${p.nSeedMulti}),
       |v0 AS (SELECT * FROM chars0 UNION ALL SELECT * FROM multi0),
       |v0c AS (SELECT piece, cnt, ${sqlCost("cnt", "v0")} AS cost_micro
       |        FROM v0)""".stripMargin

  /** `floor(1e6·ln(total/cnt))` over a vocab CTE. */
  def sqlCost(cnt: String, vocabCte: String): String =
    s"CAST(floor(1e6 * ln(CAST((SELECT sum(cnt) FROM $vocabCte) " +
      s"AS DOUBLE) / $cnt)) AS BIGINT)"

  /** Recursive Viterbi + backwalk over a words CTE `src(w, n)` and a
    * vocab CTE `(piece, cost_micro)`, emitting `seg$tag(w, n, ps)`.
    * Requires the statement to open `WITH RECURSIVE`. */
  def sqlSegCtes(tag: String, src: String, vocabCte: String,
                 p: Params): String =
    s"""vm$tag AS (SELECT map(list(piece ORDER BY piece),
       |             list(cost_micro ORDER BY piece)) AS mm
       |           FROM $vocabCte),
       |dp$tag(w, n, pos, best) AS (
       |  SELECT w, n, 0, [CAST(0 AS BIGINT)] FROM $src
       |  UNION ALL
       |  SELECT w, n, pos + 1, list_append(best, coalesce(
       |    list_min(list_filter(list_transform(
       |      range(greatest(pos + 1 - ${p.maxPieceLen}, 0), pos + 1),
       |      j -> CASE WHEN (mm[substr(w, j + 1, pos + 1 - j)])[1]
       |                     IS NOT NULL
       |           THEN (best[j + 1] // 32 +
       |                 (mm[substr(w, j + 1, pos + 1 - j)])[1]) * 32 + j
       |           END),
       |      x -> x IS NOT NULL)),
       |    ${Unreach} * 32))
       |  FROM dp$tag, vm$tag WHERE pos < length(w)),
       |dpf$tag AS (SELECT w, n, best FROM dp$tag WHERE pos = length(w)),
       |walk$tag(w, n, pos, ps) AS (
       |  SELECT w, n, length(w), CAST([] AS VARCHAR[]) FROM dpf$tag
       |  UNION ALL
       |  SELECT k.w, k.n, CAST(f.best[k.pos + 1] % 32 AS INT),
       |         list_prepend(substr(k.w, f.best[k.pos + 1] % 32 + 1,
       |           k.pos - f.best[k.pos + 1] % 32), k.ps)
       |  FROM walk$tag k JOIN dpf$tag f ON k.w = f.w WHERE k.pos > 0),
       |seg$tag AS (SELECT w, n, ps FROM walk$tag WHERE pos = 0)""".stripMargin

  /** One EM round r: usage + prune over `seg$r` → `v${r}c`. */
  def sqlRoundCtes(r: Int, p: Params): String =
    s"""usage$r AS (SELECT piece, CAST(sum(n) AS BIGINT) AS u FROM
       |              (SELECT n, unnest(ps) AS piece FROM seg${r - 1})
       |            GROUP BY piece),
       |vch$r AS (SELECT c.piece, coalesce(u.u, 0) + 1 AS cnt
       |          FROM chars0 c LEFT JOIN usage$r u USING (piece)),
       |vmu$r AS (SELECT piece, u + 1 AS cnt FROM usage$r
       |          WHERE length(piece) >= 2 AND u > 0
       |          ORDER BY u DESC, piece ASC LIMIT ${p.nKeepMulti}),
       |v$r AS (SELECT * FROM vch$r UNION ALL SELECT * FROM vmu$r),
       |v${r}c AS (SELECT piece, CAST(cnt AS BIGINT) AS cnt,
       |             ${sqlCost("cnt", s"v$r")} AS cost_micro
       |           FROM v$r)""".stripMargin

  /** Full train replay: census → seed → `rounds` EM rounds; the final
    * vocab CTE is `v${rounds}c`. */
  def sqlTrainCtes(p: Params, rounds: Int): String = {
    val blocks = Seq(sqlCensusCtes(p), sqlSeedCtes(p)) ++
      (1 to rounds).flatMap(r => Seq(
        sqlSegCtes((r - 1).toString, "wtr",
          if (r == 1) "v0c" else s"v${r - 1}c", p),
        sqlRoundCtes(r, p)))
    blocks.mkString(",\n")
  }
}
