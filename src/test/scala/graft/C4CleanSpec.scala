package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.TextAnalysis

/** The C4 line rules on hand fixtures: terminal-punctuation and
  * word-count line gates, the javascript line kill, the lorem-ipsum and
  * brace page kills, the kept-lines page floor, and the NULL-text
  * total-function convention. */
class C4CleanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def clean(rows: Seq[(Long, String)], minKept: Int = 3) = {
    import spark.implicits._
    TextAnalysis.c4Clean(rows.toDF("doc_id", "text"),
        minKeptLines = minKept)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("text_clean"), r.getAs[Long]("n_lines"),
          r.getAs[Long]("n_kept"), r.getAs[Boolean]("page_kept"))))
      .toMap
  }

  test("line gates: punctuation, word floor, javascript; page floor") {
    val page = Seq(
      "this sentence ends with a period.",
      "no terminal punctuation here",
      "too short.",
      "please enable javascript to proceed.",
      "does this question count as a line?",
      "a quoted ending counts too\"").mkString("\n")
    val out = clean(Seq(1L -> page), minKept = 3)
    val (cleaned, nLines, nKept, kept) = out(1L)
    assert(nLines === 6L && nKept === 3L && kept)
    assert(cleaned === Seq(
      "this sentence ends with a period.",
      "does this question count as a line?",
      "a quoted ending counts too\"").mkString("\n"))
    // same page at a floor of 4 kept lines is dropped
    assert(!clean(Seq(1L -> page), minKept = 4)(1L)._4)
  }

  test("page kills: lorem ipsum and braces drop the page whole") {
    val good = "one good sentence right here.\nand then another one follows.\nplus a third to clear the floor."
    val out = clean(Seq(
      1L -> good,
      2L -> (good + "\nLorem Ipsum dolor sit amet."),
      3L -> (good + "\nfunction f() { return 1; }")))
    assert(out(1L)._4)
    assert(!out(2L)._4 && !out(3L)._4)
    // the clean text is still produced for QA, page verdict aside
    assert(out(2L)._3 >= 3L)
  }

  test("NULL and empty text read as one unkeepable line") {
    val out = clean(Seq(1L -> null, 2L -> ""))
    assert(out(1L) === (("", 1L, 0L, false)))
    assert(out(2L) === (("", 1L, 0L, false)))
  }
}
