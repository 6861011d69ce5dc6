package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.TextAnalysis

/** The Gopher length/symbol/stop-word gates on hand fixtures — each
  * gate flipped independently around a passing base document. */
class GopherQualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // 50 words, mean length in range, two required stops, all alphabetic
  private val base = (("the " * 10) + ("and " * 10) +
    ("word " * 30)).trim

  private def run(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    TextAnalysis.gopherQuality(rows.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r)
      .toMap
  }

  test("the base document passes every gate") {
    val r = run(Seq(1L -> base))(1L)
    assert(r.getAs[Long]("n_words") === 50L)
    assert(r.getAs[Long]("req_stops") === 2L)
    assert(r.getAs[Long]("alpha_micro") === 1000000L)
    assert(r.getAs[Boolean]("gopher_kept"))
  }

  test("each gate fails independently") {
    val out = run(Seq(
      2L -> "too few words here.",                    // word floor
      3L -> base.replace("word", "w"),                // mean length < 3
      4L -> base.replace("word", "absolutely#not"),   // symbols + length
      5L -> (base + (" 123" * 20)),                   // alpha ratio < 80%
      6L -> ("lorem ipsum dolor sit amet " * 10)))    // no required stops
    assert(!out(2L).getAs[Boolean]("gopher_kept"))
    assert(out(3L).getAs[Long]("mwl_micro") < 3000000L)
    assert(!out(3L).getAs[Boolean]("gopher_kept"))
    assert(out(4L).getAs[Long]("sym_micro") > 100000L)
    assert(!out(4L).getAs[Boolean]("gopher_kept"))
    assert(out(5L).getAs[Long]("alpha_micro") < 800000L)
    assert(!out(5L).getAs[Boolean]("gopher_kept"))
    assert(out(6L).getAs[Long]("req_stops") === 0L)
    assert(!out(6L).getAs[Boolean]("gopher_kept"))
  }

  test("line gates: bullets and ellipses count per line") {
    val bullets = (1 to 9).map(i => s"- item $i").mkString("\n") +
      "\nonly one normal line"
    val r = run(Seq(7L -> bullets))(7L)
    assert(r.getAs[Long]("bullet_micro") === 900000L)
    val dots = "first line trails off...\nsecond stays.\nthird stays.\nfourth stays."
    val r2 = run(Seq(8L -> dots))(8L)
    assert(r2.getAs[Long]("ellipsis_micro") === 250000L)
    assert(r2.getAs[Long]("sym_micro") > 0L) // the ... counts as symbol too
  }

  test("NULL and empty text fail closed with zeroed signals") {
    val out = run(Seq(9L -> null, 10L -> ""))
    Seq(9L, 10L).foreach { id =>
      assert(out(id).getAs[Long]("n_words") === 0L)
      assert(out(id).getAs[Long]("mwl_micro") === 0L)
      assert(!out(id).getAs[Boolean]("gopher_kept"))
    }
  }
}
