package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{Bpe, Unigram}

/** Unigram-LM tokenizer: Viterbi correctness (min-cost, tie prefers
  * the longer piece), reconstruction, EM/prune invariants, and the
  * segment-docs reassembly. */
class UnigramSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val P = Unigram.Params()

  private def census(rows: (String, Long)*) = {
    import spark.implicits._
    rows.toSeq.toDF("w", "n")
  }

  private def segWith(vocab: Map[String, Long], w: String): Seq[String] = {
    Unigram.segmentCensus(census(w -> 1L), vocab, P)
      .select("ps").head().getSeq[String](0)
  }

  test("viterbi picks the min-cost split; ties prefer the longer piece") {
    // ab cheaper than a+b -> one piece
    assert(segWith(Map("a" -> 1000000L, "b" -> 1000000L,
      "ab" -> 1500000L), "ab") === Seq("ab"))
    // exact tie (cost(ab) = cost(a)+cost(b)) -> longer piece wins
    assert(segWith(Map("a" -> 1000000L, "b" -> 1000000L,
      "ab" -> 2000000L), "ab") === Seq("ab"))
    // ab more expensive -> chars win
    assert(segWith(Map("a" -> 1000000L, "b" -> 1000000L,
      "ab" -> 2100000L), "ab") === Seq("a", "b"))
    // window: pieces up to maxPieceLen chars participate
    assert(segWith(Map("a" -> 9000000L, "b" -> 9000000L, "c" -> 9000000L,
      "d" -> 9000000L, "abcd" -> 1000000L), "abcdd") ===
      Seq("abcd", "d"))
  }

  test("train invariants: coverage, reconstruction, bounded vocab") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("text")
    val cen = Bpe.wordCensus(docs)
    for (rounds <- Seq(1, 2)) {
      val vocab = Unigram.train(cen, P, rounds)
        .select("piece", "cnt", "cost_micro")
        .as[(String, Long, Long)].collect()
      val singles = vocab.filter(_._1.length == 1).map(_._1).toSet
      val corpusChars = cen.select("w").as[String].collect()
        .flatMap(_.take(P.maxWordLen)).map(_.toString).toSet
      assert(singles === corpusChars, "every corpus char survives")
      assert(vocab.count(_._1.length > 1) <= P.nKeepMulti)
      assert(vocab.forall(v => v._2 >= 1 && v._3 >= 0))
      // reconstruction: pieces concat back to every census word
      val vm = vocab.map(v => v._1 -> v._3).toMap
      val seg = Unigram.segmentCensus(
        Unigram.truncCensus(cen, P.maxWordLen), vm, P)
        .select("w", "ps").as[(String, Seq[String])].collect()
      assert(seg.nonEmpty)
      seg.foreach { case (w, ps) =>
        assert(ps.mkString === w, s"reconstruction of $w")
        assert(ps.forall(vm.contains), s"all pieces in vocab for $w")
      }
    }
  }

  test("segmentDocs: census join reassembles document order") {
    import spark.implicits._
    val docs = Seq((1L, "aa ab aa"), (2L, "b")).toDF("doc_id", "text")
    val cen = Bpe.wordCensus(docs)
    val vm = Map("a" -> 2000000L, "b" -> 2000000L, "aa" -> 1000000L,
      "ab" -> 9000000L)
    val seg = Unigram.segmentCensus(
      Unigram.truncCensus(cen, P.maxWordLen), vm, P)
    val got = Unigram.segmentDocs(docs, seg, P)
      .select("doc_id", "n_words", "n_pieces", "seg")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, 3L, 4L, "aa a+b aa"), (2L, 1L, 1L, "b")))
  }
}
