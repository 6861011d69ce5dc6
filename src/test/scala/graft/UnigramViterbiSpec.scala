package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Unigram

/** The native UnigramViterbi expression vs the column form it replaced
  * ([[Unigram.segmentCensusColumnForm]], the dpCol/walkCol stack that
  * is also the oracle's recursive-CTE algorithm): identical piece
  * lists on a real trained vocabulary, tie-break words, unreachable
  * (foreign-alphabet) words, and words at the maxWordLen bound —
  * through parquet (codegen) and a local relation. */
class UnigramViterbiSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val p = Unigram.Params(maxPieceLen = 4, maxWordLen = 16,
    nSeedMulti = 24, nKeepMulti = 16)

  // a small trained vocabulary: train on a toy census so costs carry
  // realistic magnitudes and multi-char pieces compete with singles
  private lazy val vocab: Map[String, Long] = {
    val census = Seq(("thequick", 30L), ("quickfox", 20L), ("the", 50L),
      ("fox", 10L), ("lazydog", 5L), ("zzz", 2L)).toDF("w", "n")
    Unigram.collectVocab(Unigram.train(census, p, rounds = 1))
  }

  private val words = Seq(
    ("thequick", 3L), ("quickfox", 2L), ("lazydog", 1L),
    ("qqq", 1L),            // only single-char pieces reachable
    ("?!", 1L),             // foreign alphabet: unreachable sentinel walk
    ("thequickfoxthequ", 1L), // exactly maxWordLen chars
    ("a", 1L), ("zz", 1L))

  test("native segmentCensus == replaced column form, bit for bit") {
    val census = words.toDF("w", "n")
    val fast = Unigram.segmentCensus(census, vocab, p)
      .select("w", "ps").as[(String, Seq[String])].collect().toMap
    val slow = Unigram.segmentCensusColumnForm(census, vocab, p)
      .select("w", "ps").as[(String, Seq[String])].collect().toMap
    assert(fast.keySet == slow.keySet)
    fast.keySet.foreach(w => assert(fast(w) == slow(w), s"word $w"))
    // and the segmentation is a real cover of each word
    fast.foreach { case (w, ps) => assert(ps.mkString("") == w, w) }
  }

  test("parity holds through parquet + whole-stage codegen") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-viterbi-spec").toString
    words.toDF("w", "n").write.mode("overwrite").parquet(dir)
    val census = spark.read.parquet(dir)
    val fast = Unigram.segmentCensus(census, vocab, p)
      .select("w", "ps").as[(String, Seq[String])].collect().toMap
    val slow = Unigram.segmentCensusColumnForm(census, vocab, p)
      .select("w", "ps").as[(String, Seq[String])].collect().toMap
    fast.keySet.foreach(w => assert(fast(w) == slow(w), s"word $w"))
  }

  test("ties prefer the longer final piece (min combined encoding)") {
    // two equal-cost paths: the combined score*32+j encoding breaks the
    // tie toward the SMALLER split start j, i.e. the longer last piece
    val v = Map("ab" -> 10L, "a" -> 5L, "b" -> 5L)
    val census = Seq(("ab", 1L)).toDF("w", "n")
    val fast = Unigram.segmentCensus(census, v, p)
      .select("ps").as[Seq[String]].collect().head
    val slow = Unigram.segmentCensusColumnForm(census, v, p)
      .select("ps").as[Seq[String]].collect().head
    assert(fast == slow)
    assert(fast == Seq("ab")) // cost 10 == 5+5, longer piece wins the tie
  }
}
