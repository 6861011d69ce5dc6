package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Dedup

/** Cross-source duplication matrix: hand-computed cells, the diagonal
  * C(n,2) arithmetic, and the NULL-text exclusion. */
class DupMatrixSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("diagonal and off-diagonal cells count groups and copy pairs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x", "a"), (2L, "x", "a"), // intra-a re-post
      (3L, "x", "b"), // b mirrors a's content
      (4L, "y", "c"), (5L, "y", "a"), // a and c share one group
      (6L, "z", "c"), // unshared — contributes nothing
      (7L, null.asInstanceOf[String], "a"),
      (8L, null.asInstanceOf[String], "b")) // NULLs never match
      .toDF("doc_id", "text", "source")
    val out = Dedup.crossSourceDupMatrix(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("n_groups"), r.getAs[Long]("n_pairs")))).toMap
    assert(out === Map(
      ("a", "a") -> ((1L, 1L)), // C(2,2 copies of "x") = 1 pair
      ("a", "b") -> ((1L, 2L)), // 2 a-copies × 1 b-copy
      ("a", "c") -> ((1L, 1L))))
  }

  test("containment: a contained quote page scores 10^6 one-way") {
    import spark.implicits._
    // doc 2 is a strict word-prefix of doc 1: every shingle of 2 occurs
    // in 1, so containment(2 in 1) = 10^6 while Jaccard is well short
    val long = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val short = "alpha beta gamma delta epsilon zeta"
    val docs = Seq((1L, long), (2L, short)).toDF("doc_id", "text")
    val out = Dedup.containmentPairs(docs).collect()
    assert(out.length === 1)
    val r = out.head
    assert((r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) === ((1L, 2L)))
    // 4 of doc 1's 8 shingles are doc 2's entire 4-shingle set
    assert(r.getAs[Long]("b_in_a_micro") === 1000000L)
    assert(r.getAs[Long]("a_in_b_micro") === 500000L)
  }

  test("minhash estimate audit: an exact dup agrees on every position") {
    import spark.implicits._
    val docs = Seq(
      (1L, "one two three four five six"),
      (2L, "one two three four five six"))
      .toDF("doc_id", "text")
    val r = Dedup.minhashEstimateAudit(docs).collect().head
    assert(r.getAs[Long]("agree") === graft.llm.TextHash.K.toLong)
    assert(r.getAs[Long]("est_micro") === 1000000L)
    assert(r.getAs[Long]("jaccard_micro") === 1000000L)
    assert(r.getAs[Long]("err_micro") === 0L)
  }

  test("span-census candidates surface a low-Jaccard quote page surely") {
    import spark.implicits._
    // 30-word original, 12-word prefix quote (Jaccard ≈ 0.36 — the
    // banded path may or may not surface it; the span path MUST)
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val quote = (1 to 12).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, base), (2L, quote)).toDF("doc_id", "text")
    val out = Dedup.containmentPairsFromSpans(docs).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("b_in_a_micro") === 1000000L)
    // a gram shared by MORE than maxGramDocs docs is shed wholesale
    val many = (1L to 5L).map(i => (i, "a b c d e f g h i j"))
      .toDF("doc_id", "text")
    assert(Dedup.containmentPairsFromSpans(many, maxGramDocs = 4)
      .count() === 0L)
    intercept[IllegalArgumentException] {
      Dedup.containmentPairsFromSpans(docs, maxGramDocs = 1)
    }
  }

  test("a duplicate-free corpus yields an empty matrix") {
    import spark.implicits._
    val docs = Seq((1L, "p", "a"), (2L, "q", "a"), (3L, "r", "b"))
      .toDF("doc_id", "text", "source")
    assert(Dedup.crossSourceDupMatrix(docs).count() === 0L)
  }
}
