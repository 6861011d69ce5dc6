package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Dedup

/** [[Dedup.exactNgramContaminationBloom]] — the Bloom-prefiltered scale
  * path of exact decontamination. The contract the spec pins: results are
  * IDENTICAL to the plain operator on any input (the confirm join removes
  * every Bloom false positive), and the sketch itself has no false
  * negatives (a missed eval gram would silently pass contaminated docs —
  * the one failure mode the design must exclude by construction). */
class BloomDecontamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private val eval = Seq(
    (900L, "the quick brown fox jumps over the lazy dog"),
    (901L, "pack my box with five dozen liquor jugs"))

  private val corpus = Seq(
    (1L, "prefix words then the quick brown fox jumps over the lazy dog indeed"),
    (2L, "pack my box with five dozen liquor jugs and more trailing words"),
    (3L, "completely unrelated content about spark catalyst optimizer rules"),
    (4L, "another clean document discussing parquet partition pruning at scale"))

  test("bloom path ≡ exact path, row for row") {
    val a = Dedup.exactNgramContamination(docs(corpus), docs(eval), shingleN = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)
    val b = Dedup.exactNgramContaminationBloom(docs(corpus), docs(eval),
        shingleN = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)
    assert(a.nonEmpty) // fixture sanity: docs 1 and 2 are contaminated
    assert(a.toSeq == b.toSeq)
  }

  test("a clean corpus yields no rows (bloom fps die in the confirm join)") {
    // fpp = 0.5: a deliberately terrible sketch so false positives DO
    // reach the confirm join — and still change nothing
    val out = Dedup.exactNgramContaminationBloom(
      docs(corpus.filter(_._1 >= 3L)), docs(eval), shingleN = 5, fpp = 0.5)
    assert(out.collect().isEmpty)
  }

  test("multi-set sweep: a doc contaminated by two sets reports once per set") {
    import spark.implicits._
    val evalSets = Seq(
      (900L, eval.head._2, "alpha"),            // same text in two sets
      (901L, eval.head._2, "beta"),
      (902L, eval(1)._2, "beta"))
      .toDF("doc_id", "text", "set")
    val out = Dedup.multiSetContamination(docs(corpus), evalSets)
      .collect().map(r => ((r.getLong(0), r.getString(1)), r.getLong(5)))
      .toMap
    // doc 1 overlaps the shared text -> one row per set, each attributed
    // to that set's own eval ids; doc 2 overlaps only beta's second doc
    assert(out.keySet == Set((1L, "alpha"), (1L, "beta"), (2L, "beta")))
    assert(out((1L, "alpha")) == 900L && out((1L, "beta")) == 901L)
    assert(out((2L, "beta")) == 902L)
  }

  test("the sketch has zero false negatives and bounded false positives") {
    import spark.implicits._
    val present = (0L until 500L).map(_ * 7919L)
    val bf = Dedup.evalGramBloom(present.toDF("g"), fpp = 0.01)
    assert(present.forall(bf.mightContainLong), "false negative in bloom")
    val absent = (1L to 10000L).map(_ * 7919L + 13L)
    val fpRate = absent.count(bf.mightContainLong).toDouble / absent.size
    assert(fpRate < 0.05, s"fp rate $fpRate far above configured 0.01")
  }
}
