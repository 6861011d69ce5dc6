package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{Curation, Dedup, TextAnalysis}

/** Known-shape checks for the corpus-level curation operators: exact
  * n-gram decontamination, the vocabulary census, and per-source quality
  * gating. */
class CurationOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("exact n-gram contamination flags verbatim overlap only") {
    val corpus = Seq(
      (1L, "alpha one two three four five omega"), // shares one 5-gram
      (2L, "totally different words here entirely now"),
      (3L, "one two three four five six"),         // exact eval copy
      (4L, "tiny doc"))                            // sub-window, exact copy
      .toDF("doc_id", "text")
    val evalSet = Seq(
      (100L, "one two three four five six"),
      (101L, "tiny doc"))
      .toDF("doc_id", "text")
    val out = Dedup.exactNgramContamination(corpus, evalSet, shingleN = 5)
      .as[(Long, Int, Long, Long, Long)].collect().sortBy(_._1).toList
    // doc 1: 3 distinct 5-grams, one ("one two three four five") leaked
    assert(out.map(_._1) == List(1L, 3L, 4L))
    assert(out(0) == ((1L, 3, 1L, 1L, 100L)))
    // doc 3: both of its 5-grams are the eval doc's
    assert(out(1) == ((3L, 2, 2L, 1L, 100L)))
    // doc 4: shorter than the window — whole text is the gram
    assert(out(2) == ((4L, 1, 1L, 1L, 101L)))
  }

  test("vocab census counts occurrences and cuts deterministically at k") {
    val docs = Seq(
      "b b b a a c", "a d d", "e").toDF("text")
    val out = TextAnalysis.vocabCensus(docs, k = 3)
      .as[(String, Long)].collect().toList
    // a:3 b:3 tie broken on token; d:2 takes the last slot over c/e:1
    assert(out == List(("a", 3L), ("b", 3L), ("d", 2L)))
  }

  test("source gate keeps majority-fluent sources of sufficient size") {
    val fluent = Array.fill(4)("the a of and to in is").mkString(" ") // 28 stopwords
    val listy = (1 to 25).map(i => s"item$i").mkString(" ")
    val docs =
      (1 to 10).map(i => (s"good", fluent)) ++
        (1 to 10).map(i => (s"bad", listy)) ++
        (1 to 3).map(i => (s"small", fluent))
    val df = docs.toDF("source", "text")
    val stats = Curation.sourceStats(df, minDocs = 10)
      .as[(String, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(stats("good") == (("good", 10L, 10L, 0L, true)))
    assert(stats("bad") == (("bad", 10L, 0L, 0L, false)))
    // fluent but below the size floor
    assert(stats("small") == (("small", 3L, 3L, 0L, false)))
    val kept = Curation.sourceGate(df, minDocs = 10)
      .select("source").distinct().as[String].collect().toSet
    assert(kept == Set("good"))
  }

  test("datasheet artifacts roll forward: merged card == full-union card") {
    // batch 2 copies doc 1's text into a NEW source: the merged card
    // must flip doc 1 to duplicate in src_a AND show the copy in src_b
    // — the non-additive dup count derived from the additive census
    val b1 = Seq(
      (1L, "alpha beta gamma", "en", "src_a"),
      (2L, "delta epsilon zeta", "en", "src_a"),
      (3L, "eta theta iota", "de", "src_a"))
      .toDF("doc_id", "text", "lang", "source")
    val b2 = Seq(
      (10L, "alpha beta gamma", "en", "src_b"),
      (11L, "totally fresh words", "en", "src_b"))
      .toDF("doc_id", "text", "lang", "source")
    def card(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getString(4), r.getLong(8))).toMap
    val merged = card(Curation.datasheetFromArtifacts(
      Curation.mergeDatasheetArtifacts(
        Curation.datasheetArtifacts(b1), Curation.datasheetArtifacts(b2))))
    val full = card(Curation.datasheet(b1.unionByName(b2)))
    assert(merged === full)
    // (n_docs, n_tokens, top_lang, dup_docs)
    assert(merged("src_a") === ((3L, 9L, "en", 1L)))
    assert(merged("src_b") === ((2L, 6L, "en", 1L)))
    // per-batch cards alone would have shown zero duplicates anywhere
    assert(card(Curation.datasheet(b1)).values.forall(_._4 == 0L))
  }

  test("snapshot diff classifies per source; removed keeps the old source") {
    val v1 = Seq(
      (1L, "same text", "a"),
      (2L, "will change", "a"),
      (3L, "will vanish", "b"),
      (4L, "moves source", "a"))
      .toDF("doc_id", "text", "source")
    val v2 = Seq(
      (1L, "same text", "a"),
      (2L, "changed text", "a"),
      (4L, "moves source", "b"),   // same content, new source -> unchanged@b
      (5L, "brand new", "b"))
      .toDF("doc_id", "text", "source")
    val d = Curation.snapshotDiff(v1, v2)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // (added, removed, changed, unchanged)
    assert(d("a") === ((0L, 0L, 1L, 1L)))
    assert(d("b") === ((1L, 1L, 0L, 1L)))
  }
}
