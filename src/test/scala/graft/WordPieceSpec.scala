package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.llm.{Bpe, WordPiece}

/** [[WordPiece]]'s likelihood-picked training and greedy longest-match
  * segmentation: the score election (vs BPE's raw frequency), the
  * `##` continuation discipline through merges and inference, and the
  * `[UNK]` arms (ineligible word, over-length word, unmatchable
  * position). */
class WordPieceSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // tests 2/3's census: 'aaab' ×4, 'ab' ×4 — every pair ties at score
  // 62500, so the (a ASC, b ASC) tie-break elects ('##a','##a')
  private def census = Seq(("aaab", 4L), ("ab", 4L)).toDF("w", "n")

  test("likelihood pick beats raw frequency; ## strips on fusion") {
    // (e,##e) has cnt 20 but score 20e6/(20·20)=50000; (x,##y) has
    // cnt 5 but score 5e6/(5·5)=200000 — BPE's raw count would pick
    // the first, WordPiece picks the second
    val c = Seq(("ee", 20L), ("xy", 5L)).toDF("w", "n")
    val (merges, _) = WordPiece.train(c, nMerges = 1)
    val m = merges.head
    assert((m.a, m.b) === ("x", "##y"))
    assert(m.ab === "xy") // b's ## marker strips on fusion
    assert(m.score_micro === 200000L)
    assert(m.cnt === 5L)
  }

  test("greedy merge application is non-overlapping left-to-right") {
    val (merges, syms) = WordPiece.train(census, nMerges = 1)
    // all pairs tie at 62500 micro; (##a,##a) wins the (a, b) ASC break
    assert((merges.head.a, merges.head.b) === ("##a", "##a"))
    assert(merges.head.ab === "##aa") // a's own ## marker survives
    val m = syms.collect().map(r =>
      r.getString(0) -> r.getSeq[String](2)).toMap
    // 'aaab' = [a,##a,##a,##b]: positions 2-3 fuse, position 4 survives
    assert(m("aaab") === Seq("a", "##aa", "##b"))
    assert(m("ab") === Seq("a", "##b"))
  }

  test("vocab carries the alphabet in both position forms plus merges") {
    val (merges, _) = WordPiece.train(census, nMerges = 1)
    val v = WordPiece.vocab(census, merges)
    assert(v.contains("a") && v.contains("##a"))
    assert(v.contains("##b") && v.contains("##aa"))
    assert(!v.contains("b")) // 'b' never appears word-initial
  }

  test("greedy longest-match segments with ## continuations") {
    val v = Set("un", "u", "##n", "##related", "##rel", "r", "##elated")
    val seg = WordPiece.segmentCensus(Seq("unrelated").toDF("w"), v)
      .collect().head
    assert(seg.getSeq[String](1) === Seq("un", "##related"))
    assert(!seg.getBoolean(2))
  }

  test("[UNK] arms: unmatchable position, ineligible, over-length") {
    val v = Set("a", "##b")
    val out = WordPiece.segmentCensus(
      Seq("abz",            // z has no continuation piece -> walk fails
        "Ab",               // uppercase -> ineligible
        "a!b",              // punctuation -> ineligible
        "abababababababab"  // 16 chars > MaxWordLen -> ineligible
      ).toDF("w"), v)
      .collect().map(r => r.getString(0) ->
        (r.getSeq[String](1), r.getBoolean(2))).toMap
    for ((w, (ps, unk)) <- out) {
      assert(unk, s"$w should be [UNK]")
      assert(ps === Seq(WordPiece.Unk), s"$w pieces: $ps")
    }
  }

  test("longest match wins over an earlier shorter vocabulary hit") {
    val v = Set("a", "ab", "abc", "##d", "##cd")
    val seg = WordPiece.segmentCensus(Seq("abcd").toDF("w"), v)
      .collect().head
    // greedy takes 'abc' (len 3) then '##d' — never 'ab' + '##cd'
    assert(seg.getSeq[String](1) === Seq("abc", "##d"))
  }

  test("withWpTokens: census join, [UNK]=1, wordless docs count zero") {
    val docs = Seq(
      (1L, "aa zz aa"),
      (2L, ""),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val words = docs.select(explode(
      graft.llm.TextHash.words(col("text"))).as("w")).distinct()
    val seg = WordPiece.segmentCensus(words, Set("a", "##a"))
    val out = WordPiece.withWpTokens(docs, seg)
      .select("doc_id", "wp_tokens", "unk_words")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(out(1L) === ((5L, 1L))) // aa=2 pieces ×2 + [UNK] for zz
    assert(out(2L) === ((0L, 0L)))
    assert(out(3L) === ((0L, 0L)))
  }

  test("training census applies the min-count and length bounds") {
    val c = Seq(("frequent", 5L), ("once", 1L),
      ("waytoolongawordxx", 9L)).toDF("w", "n")
    val kept = WordPiece.trainCensus(c).collect().map(_.getString(0))
    assert(kept === Array("frequent"))
  }
}
