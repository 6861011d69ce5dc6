package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Bpe

/** Tokenizer coverage card: exact counts against a hand-built
  * segmentation table, including the wordless-source and fallback
  * branches. */
class TokenizerCoverageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("per-source coverage, fallback cost, and the wordless branch") {
    import spark.implicits._
    val seg = Seq(("hello", 2L), ("world", 1L)).toDF("w", "n_sub")
    val docs = Seq(
      (1L, "hello world", "a"),
      (2L, "hello unknown", "a"), // 'unknown' → 7-char fallback
      (3L, null.asInstanceOf[String], "b"))
      .toDF("doc_id", "text", "source")
    val out = Bpe.coverageCard(docs, seg).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_words"),
          r.getAs[Long]("n_covered"), r.getAs[Long]("coverage_micro"),
          r.getAs[Long]("bpe_tokens"), r.getAs[Long]("fallback_tokens"))))
      .toMap
    assert(out("a") === ((2L, 4L, 3L, 750000L, 12L, 7L)))
    assert(out("b") === ((1L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("a fully covering table cards at 10^6 with zero fallback") {
    import spark.implicits._
    val docs = Seq((1L, "x y x", "s")).toDF("doc_id", "text", "source")
    val (_, syms) = Bpe.train(Bpe.wordCensus(docs), nMerges = 2)
    val out = Bpe.coverageCard(docs, Bpe.segmentCounts(syms)).collect().head
    assert(out.getAs[Long]("coverage_micro") === 1000000L)
    assert(out.getAs[Long]("fallback_tokens") === 0L)
  }
}
