package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.functions.udf

/** Portable text hashing for the LLM-pipeline operators: every hash here
  * is defined once and emitted twice — as a Catalyst column expression and
  * as the equivalent DuckDB SQL fragment — so the oracle replays the exact
  * same minhash/LSH math and the correctness gate can hash-compare results
  * bit for bit.
  *
  * Base hash: the first 8 hex chars of md5 (md5 is identical everywhere),
  * reduced mod P = 2^31-1 so affine minhash products stay in 63 bits.
  * Affine family: h_j(x) = (a_j * x + b_j) mod P with fixed coefficients.
  *
  * Scale: all of this is per-row column algebra over string arrays — no
  * shuffle, fully whole-stage-codegen'd; the only shuffles in dedup are
  * the band groupBy/join, which is the point of LSH.
  */
object TextHash {
  val P = 2147483647L // 2^31 - 1

  /** Minhash signature length and LSH banding (8 bands × 3 rows). */
  val K = 24
  val BandRows = 3
  val NumBands: Int = K / BandRows

  /** Fixed affine coefficients, j = 0 until K. */
  val A: IndexedSeq[Long] = (0 until K).map(j => ((j + 1) * 1103515245L + 12345L) % P)
  val B: IndexedSeq[Long] = (0 until K).map(j => ((j + 1) * 69069L + 7L) % P)

  // ── Spark side ────────────────────────────────────────────────────────
  /** 32-bit md5-prefix hash reduced mod P. */
  def h32p(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long") % P

  /** Non-empty SINGLE-SPACE-separated tokens — the corpus contract (and
    * the DuckDB twin's `string_split` on ' '). Text using tabs/newlines
    * as separators must be normalized first (withNormalizedText does
    * exactly that); splitting here on `\\s+` would double the regex cost
    * on the hottest path for a case normalization already handles.
    * Backed by the native one-pass [[graft.functions.WordsSplit]]
    * (byte-scan split + empty-drop fused — the previous
    * `filter(split(text, " "), ...)` ran an interpreted lambda over
    * every empty run between spaces, on EVERY text operator's first
    * step). */
  def words(text: Column): Column =
    call_function(graft.functions.GraftFunctions.WordsName, text)

  /** Distinct word n-gram shingles ("a b c"-style); whole text if shorter
    * than n words. The windowed branch is the native one-pass
    * [[graft.functions.WordShingles]] (fused slide+join+dedupe — see its
    * doc for the HOF-tax argument); the short-doc branch keeps the
    * column form, whose single `concat_ws` also defines the null-words
    * behavior (`[""]`). Same values and order as the previous
    * `array_distinct(transform(sequence(...), slice+concat_ws))` and the
    * oracle's [[sqlShingles]]. */
  def shingles(ws: Column, n: Int): Column =
    when(size(ws) >= n,
      call_function(graft.functions.GraftFunctions.ShinglesName, ws, lit(n)))
      .otherwise(array(concat_ws(" ", ws)))

  /** Hashed shingle array (mod P), backed by the native codegen
    * expression [[graft.functions.HashedShingles]] (direct MD5 over the
    * UTF-8 bytes, no hex round-trip, no per-element HOF dispatch — see
    * its doc). Same numbers as `transform(sh, s => h32p(s))` and the
    * oracle's [[sqlHashedShingles]]. Requires
    * [[graft.GraftSession.ensure]] on sessions the library did not
    * build. */
  def hashedShingles(sh: Column): Column =
    call_function(graft.functions.GraftFunctions.HashedShinglesName, sh)

  /** K-element minhash signature over hashed shingles, backed by the
    * native codegen expression [[graft.functions.MinhashSig]] (one pass,
    * K-slot primitive accumulator, no Ser/De — see its doc for the
    * builtin-vs-UDF-vs-Expression argument). Same
    * `(A(j)·h + B(j)) mod P` arithmetic as the DuckDB oracle's
    * [[sqlMinhashSig]]; empty input degenerates to all-null, matching
    * `array_min` of an empty array. Requires [[graft.GraftSession
    * .ensure]] on sessions the library did not build. */
  def minhashSig(hs: Column): Column =
    call_function(graft.functions.GraftFunctions.MinhashName, hs)

  /** LSH band keys: NumBands strings of BandRows comma-joined sig values.
    *
    * `concat` (not `concat_ws`): concat PROPAGATES null, so a null
    * signature (or null signature slot) yields null band keys, and null
    * keys match nothing in the band equi-join — enforcing end-to-end the
    * invariant [[graft.functions.MinhashSig]] states (no bucketing on
    * partial signatures). concat_ws SKIPS nulls, which would give every
    * broken doc the same "" key — N broken docs banding together is N²
    * candidate pairs of garbage per band. */
  def bandKeys(sig: Column): Column =
    array((0 until NumBands).map { bi =>
      concat((0 until BandRows).flatMap(ri =>
        (if (ri == 0) Nil else Seq(lit(","))) :+
          sig(bi * BandRows + ri).cast("string")): _*)
    }: _*)

  /** Executor/driver-side twin of [[words]]: the same non-empty
    * single-space-token contract, for typed (Dataset) code — one
    * definition, so the streaming twins cannot drift from the column
    * operators' tokenization. */
  def wordsScala(text: String): Array[String] =
    if (text == null) Array.empty else text.split(" ").filter(_.nonEmpty)

  /** Executor/driver-side twin of [[h32p]]: first 4 md5 bytes as an
    * unsigned 32-bit value, mod P — byte-identical to the column form's
    * `conv(substring(md5(c),1,8),16,10) % P`, so typed (Dataset) code can
    * partition/assign by the same hash the column-algebra operators use. */
  /** The one definition of the digest→value step: first 4 MD5 bytes as
    * an unsigned big-endian 32-bit number, mod P. Every Scala-side hash
    * path ([[h32pScala]], the native [[graft.functions.HashedShingles]])
    * routes through here so the bit-parity contract with [[sqlH32p]]
    * lives in exactly one place (the codegen template in HashedShingles
    * is the documented exception — it inlines the same shifts). */
  def h32pBytes(d: Array[Byte]): Long =
    (((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)) % P

  def h32pScala(s: String): Long =
    h32pBytes(java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")))

  /** 64-bit md5 prefix as a fixed-width 16-hex-char string — the census
    * gram key. Unlike [[h32p]] (31-bit keyspace, sized for affine minhash
    * products), this keyspace is sized for corpus-scale DISTINCT-key
    * artifacts: at 10¹² distinct grams (the 100 TB regime) the birthday
    * expectation under 2⁶⁴ is ~3·10⁴ colliding pairs — a ~3·10⁻⁸
    * false-duplicate fraction — where 2³¹ would collide essentially
    * every gram. Kept as hex text (not a BIGINT) because a full 64-bit
    * unsigned value cannot round-trip `conv`/CAST on both engines
    * without overflow games; 16 fixed bytes is still a fixed-width
    * shuffle key. NULL propagates through md5/substring on both
    * engines, matching [[sqlH64x]]. */
  def h64x(c: Column): Column = substring(md5(c), 1, 16)

  // ── DuckDB side (same math, same constants) ───────────────────────────
  /** SQL: h32p over a string expression. The NULL case is explicit:
    * DuckDB's `concat` SKIPS null arguments, so without the guard a NULL
    * input becomes `CAST('0x' AS BIGINT)` — a hard conversion error
    * killing the whole oracle query — where Spark's concat/conv
    * propagate NULL. */
  def sqlH32p(e: String): String =
    s"(CASE WHEN $e IS NULL THEN NULL ELSE " +
      s"CAST(concat('0x', substr(md5($e), 1, 8)) AS BIGINT) % $P END)"

  /** SQL twin of [[h64x]] — DuckDB's md5 is the same lowercase hex. */
  def sqlH64x(e: String): String = s"substr(md5($e), 1, 16)"

  /** SQL: tokens CTE fragment — `list_filter(string_split(text,' '), ...)`. */
  def sqlWords(e: String): String =
    s"list_filter(string_split($e, ' '), x -> x <> '')"

  /** SQL: distinct n-gram shingles over a words list expression `w`. */
  def sqlShingles(w: String, n: Int): String =
    s"""list_distinct(CASE WHEN len($w) >= $n
       | THEN list_transform(range(1, len($w) - ${n - 2}), i -> array_to_string(($w)[i:i+${n - 1}], ' '))
       | ELSE [array_to_string($w, ' ')] END)""".stripMargin.replaceAll("\n", "")

  /** SQL: hashed shingles over a shingle-list expression. */
  def sqlHashedShingles(sh: String): String =
    s"list_transform($sh, s -> ${sqlH32p("s")})"

  /** SQL: minhash signature list over a hashed-shingle list expression. */
  def sqlMinhashSig(hs: String): String =
    (0 until K).map { j =>
      s"list_min(list_transform($hs, h -> (${A(j)} * h + ${B(j)}) % $P))"
    }.mkString("[", ", ", "]")

  /** SQL: band-key list over a signature list expression (1-based index).
    * `||` (not concat): DuckDB's concat SKIPS nulls where `||` propagates
    * them — the same null-signature contract as [[bandKeys]]. */
  def sqlBandKeys(sig: String): String =
    (0 until NumBands).map { bi =>
      (0 until BandRows).map(ri => s"CAST(($sig)[${bi * BandRows + ri + 1}] AS VARCHAR)")
        .mkString(" || ',' || ")
    }.mkString("[", ", ", "]")
}
