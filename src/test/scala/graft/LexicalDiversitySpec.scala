package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.TextAnalysis

/** Lexical-diversity signals: hand-computed TTR / hapax / word-entropy
  * values, the NULL≡empty branch, and the verdict's two kill modes
  * (low-entropy spam, sub-floor stubs). */
class LexicalDiversitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(texts: (Long, String)*): Map[Long, (Long, Long, Long, Long, Boolean)] = {
    import spark.implicits._
    TextAnalysis.lexicalDiversity(texts.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n_words"),
        r.getAs[Long]("ttr_micro"), r.getAs[Long]("hapax_micro"),
        r.getAs[Long]("went_micro"), r.getAs[Boolean]("lex_kept"))))
      .toMap
  }

  test("hand-computed signals on a mixed-frequency doc") {
    // "the"×3 + 5 hapaxes, N=8: ttr 6/8, hapax 5/8, entropy
    // (3·⌊10⁶·ln(8/3)⌋ + 5·⌊10⁶·ln 8⌋) DIV 8 = 1667461 micro-nats
    val out = run(1L -> "the cat sat on the mat the end")
    assert(out(1L) === ((8L, 750000L, 625000L, 1667461L, true)))
  }

  test("uniform spam has zero entropy; all-distinct stub dies at the floor") {
    val out = run(
      1L -> "spam spam spam spam", // distinct 1 → ln(1) = 0
      2L -> "a b c d", // all hapax, but ln 4 ≈ 1.386 nats < 1.5 floor
      3L -> "ok thanks") // ln 2 nats — the 2-word stub
    assert(out(1L) === ((4L, 250000L, 0L, 0L, false)))
    assert(out(2L)._4 === 1386294L) // ⌊10⁶·ln 4⌋
    assert(!out(2L)._5 && !out(3L)._5)
  }

  test("NULL and empty text are all-zero and not kept") {
    val out = run(1L -> null, 2L -> "", 3L -> "   ")
    for (id <- 1L to 3L)
      assert(out(id) === ((0L, 0L, 0L, 0L, false)))
  }

  test("thresholds are caller-tunable") {
    import spark.implicits._
    val out = TextAnalysis.lexicalDiversity(
      Seq((1L, "a b c d")).toDF("doc_id", "text"),
      minEntMicro = 1000000L).collect()
    assert(out.head.getAs[Boolean]("lex_kept"))
  }
}
