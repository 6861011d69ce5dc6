package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.TextAnalysis

/** Language purity: pure docs score 10^6, interleaved docs flag, and the
  * no-words branch stays NULL/false. */
class LangPuritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(texts: (Long, String)*) = {
    import spark.implicits._
    TextAnalysis.langPurity(texts.toDF("doc_id", "text"), chunkWords = 4)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("doc_lang"), r.getAs[Long]("n_chunks"),
          r.getAs[Long]("n_agree"), r.getAs[Long]("n_langs"),
          r.getAs[Long]("purity_micro"), r.getAs[Boolean]("mixed"))))
      .toMap
  }

  test("a single-language doc is pure; an interleaved doc flags") {
    val out = run(
      // 2 chunks, both English
      1L -> "the cat is of the dog and a",
      // chunk 1 English, chunks 2-3 German: purity 1/3, mixed
      2L -> "the cat is of der die das und der die das und",
      3L -> null.asInstanceOf[String])
    assert(out(1L) === (("en", 2L, 2L, 1L, 1000000L, false)))
    val (dl2, nc2, na2, nl2, pm2, mixed2) = out(2L)
    assert(nc2 === 3L && nl2 === 2L && mixed2)
    assert(pm2 === (na2 * 1000000L) / 3L)
    assert(out(3L) === ((null, 0L, 0L, 0L, 0L, false)))
  }

  test("a stopword-free doc defaults every chunk to the priority language") {
    val out = run(1L -> "zzz yyy xxx www vvv uuu ttt sss")
    assert(out(1L)._1 === "en")
    assert(out(1L)._5 === 1000000L)
    assert(!out(1L)._6)
  }
}
