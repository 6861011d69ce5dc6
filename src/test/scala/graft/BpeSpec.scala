package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{Bpe, BpeMerge}

/** BPE training on the classic hand-computable census: merge picks
  * follow (count DESC, a ASC, b ASC), application is greedy
  * left-to-right non-overlapping (same-symbol runs merge pairwise),
  * training stops when no pair remains, and the census is additive. */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("merge sequence on the classic low/lower/newest/widest census") {
    import spark.implicits._
    val census = Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L)).toDF("w", "n")
    val (merges, syms) = Bpe.train(census, nMerges = 4)
    // round 1: es=9 ties st=9 -> 'e' < 's' picks (e,s); round 2 fuses
    // (es,t); rounds 3-4: lo=7 ties ow=7 -> (l,o), then (lo,w)
    assert(merges === Seq(
      BpeMerge(1, "e", "s", 9L),
      BpeMerge(2, "es", "t", 9L),
      BpeMerge(3, "l", "o", 7L),
      BpeMerge(4, "lo", "w", 7L)))
    val segs = syms.collect()
      .map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    assert(segs("low") === Seq("low"))
    assert(segs("lower") === Seq("low", "e", "r"))
    assert(segs("newest") === Seq("n", "e", "w", "est"))
    assert(segs("widest") === Seq("w", "i", "d", "est"))
  }

  test("same-symbol runs merge pairwise and training exhausts cleanly") {
    import spark.implicits._
    val census = Seq(("aaaa", 1L)).toDF("w", "n")
    val (merges, syms) = Bpe.train(census, nMerges = 5)
    // round 1: (a,a)x3 -> greedy gives [aa, aa]; round 2: (aa,aa)x1 ->
    // [aaaa]; round 3 finds no pair and training stops early
    assert(merges === Seq(
      BpeMerge(1, "a", "a", 3L),
      BpeMerge(2, "aa", "aa", 1L)))
    assert(syms.collect().head.getSeq[String](2) === Seq("aaaa"))
  }

  test("word census is additive and keeps only the alnum core") {
    import spark.implicits._
    val b1 = Seq((1L, "the cat the"), (2L, "cat!")).toDF("doc_id", "text")
    val b2 = Seq((3L, "the dog")).toDF("doc_id", "text")
    val merged = Bpe.mergeWordCensus(
        Bpe.wordCensus(b1), Bpe.wordCensus(b2))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = Bpe.wordCensus(b1.unionByName(b2))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged === full)
    assert(merged === Map("the" -> 3L, "cat" -> 1L, "dog" -> 1L))
  }

  test("tokenization via the lookup table, with char fallback off-table") {
    import spark.implicits._
    val census = Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L)).toDF("w", "n")
    val (_, syms) = Bpe.train(census, nMerges = 4)
    val docs = Seq(
      (1L, "low lower"),          // 1 + 3 subwords
      (2L, "newest cat!"),        // 4 + fallback length("cat!") = 4
      (3L, ""),                   // wordless
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val toks = Bpe.withBpeTokens(docs, Bpe.segmentCounts(syms))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(toks === Map(1L -> 4L, 2L -> 8L, 3L -> 0L, 4L -> 0L))
  }

  test("tokenizer persists and reloads; census roll-forward retrains same") {
    import spark.implicits._
    val b1 = Seq((1L, "low lower low"), (2L, "newest widest")).toDF("doc_id", "text")
    val b2 = Seq((3L, "newest newest lowest")).toDF("doc_id", "text")
    val rolled = Bpe.mergeWordCensus(Bpe.wordCensus(b1), Bpe.wordCensus(b2))
    val (mInc, symsInc) = Bpe.train(rolled, nMerges = 3)
    val (mFull, _) = Bpe.train(Bpe.wordCensus(b1.unionByName(b2)), nMerges = 3)
    assert(mInc === mFull)

    val dir = java.nio.file.Files
      .createTempDirectory("graft-bpe-tok").toString
    Bpe.writeTokenizer(dir, mInc, symsInc)
    assert(Bpe.readMerges(spark, dir) === mInc)
    val docs = Seq((9L, "lowest unknown")).toDF("doc_id", "text")
    val viaDisk = Bpe.withBpeTokens(docs,
        Bpe.segmentCounts(Bpe.readSegments(spark, dir)))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val viaMem = Bpe.withBpeTokens(docs, Bpe.segmentCounts(symsInc))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(viaDisk === viaMem)
  }

  test("merge replay reproduces the trained segmentation on census words") {
    import spark.implicits._
    val census = Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L), ("aaaa", 1L)).toDF("w", "n")
    val (merges, syms) = Bpe.train(census, nMerges = 6)
    val trained = syms.collect()
      .map(r => r.getString(0) -> r.getSeq[String](2)).toMap
    val replayed = Bpe.segmentWithMerges(census.select("w"), merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(replayed === trained) // incl. the same-symbol 'aaaa' runs
  }

  test("merge replay segments words the census never saw") {
    import spark.implicits._
    val census = Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L)).toDF("w", "n")
    val (merges, _) = Bpe.train(census, nMerges = 4)
    // merges: (e,s) (es,t) (l,o) (lo,w) — 'slowest' never trained, but
    // the rank-ordered replay fuses es→est and l-o-w all the same
    val out = Bpe.segmentWithMerges(
        Seq("slowest", "can't", "---").toDF("w"), merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(out("slowest") === Seq("s", "low", "est"))
    assert(out("can't") === Seq("c", "a", "n", "t")) // training's core split
    assert(out("---") === Seq.empty) // no core chars at all
  }

  test("replay-exact tokenization counts unseen words by their true segmentation") {
    import spark.implicits._
    val census = Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L)).toDF("w", "n")
    val (merges, syms) = Bpe.train(census, nMerges = 4)
    val docs = Seq(
      (1L, "low lower"),   // on-table: 1 + 3, same as withBpeTokens
      (2L, "slowest cat!") // replay: 3 ('s low est') + 3 — NOT length 7+4
    ).toDF("doc_id", "text")
    val toks = Bpe.withBpeTokensReplay(docs, Bpe.segmentCounts(syms),
        merges)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(toks === Map(1L -> 4L, 2L -> 6L))
  }

  test("symbol census reports the weighted subword vocabulary") {
    import spark.implicits._
    val census = Seq(("ab", 2L), ("b", 3L)).toDF("w", "n")
    val (_, syms) = Bpe.train(census, nMerges = 1)
    val sc = Bpe.symbolCensus(syms)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sc === Map("ab" -> 2L, "b" -> 3L))
  }
}
