package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{Curation, LangModel, QualityModel, TextAnalysis}

/** The incremental-curation identity: curating a new batch against the
  * persisted artifacts of everything before must equal a full re-run over
  * the union, restricted to the new batch's docs — and every artifact
  * must roll forward to exactly what a full rebuild would produce. This
  * is the run-over-run 100 TB story: the old corpus is never re-read.
  *
  * Doc texts use per-doc-unique vocabularies so near-dup pairs exist
  * exactly where the fixture derives them (truncation/reversal within a
  * family) — membership assertions are then exact, not probabilistic. */
class CurationIncrementalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** 26 words, all unique to doc `i` — long enough for the n_words >= 20
    * gate, sharing zero shingles across families. */
  private def text(i: Long): String =
    (0 until 26).map(j => s"t${i}x$j").mkString(" ")

  private def rev(t: String): String = t.split(" ").reverse.mkString(" ")
  private def trunc(t: String, k: Int): String =
    t.split(" ").dropRight(k).mkString(" ")

  private def df(rows: Seq[(Long, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "source")
  }

  // b1: 30 originals across two sources.
  private val b1 = df((0L until 30L).map(i =>
    (i, text(i), if (i % 3 == 0) "web" else "books")))

  // b2 exercises every cross-batch path:
  //  - 100+i: exact dups of b1 docs        (dropped: old rep wins)
  //  - 200+i: truncated near-dups of b1    (dropped via new-old pair)
  //  - 300+i: fresh reversed docs          (kept: reversal shares no
  //           shingles with the forward originals)
  //  - 400+i: exact dups of the fresh docs (dropped: 300+i wins in-batch)
  //  - 500+i: truncated fresh docs         (dropped via new-new pair)
  private val b2 = df(
    (0L until 30L by 5L).map(i => (100L + i, text(i), "web")) ++
    (0L until 30L by 6L).map(i => (200L + i, trunc(text(i), 5), "web")) ++
    (0L until 30L by 3L).map(i => (300L + i, rev(text(i)), "books")) ++
    (0L until 30L by 6L).map(i => (400L + i, rev(text(i)), "books")) ++
    (0L until 30L by 15L).map(i =>
      (500L + i, trunc(rev(text(i)), 5), "books")))

  private def keptSet(df: DataFrame): Set[(Long, String, Long, String)] =
    df.select(col("doc_id"), col("pred_lang"), col("n_words"),
        col("quality_bucket")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getAs[Number](2).longValue, r.getString(3)))
      .toSet

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("incremental verdict == full re-run restricted to the new batch") {
    val (kept1, art1) = Curation.artifactsOf(b1, sourceCol = Some("source"))
    val (kept2, _) = Curation.curateIncremental(b2, art1,
      sourceCol = Some("source"))
    val full = Curation.curate(b1.unionByName(b2))
    assert(keptSet(kept2) == keptSet(full.filter(col("doc_id") >= 100L)))
    // the bootstrap kept set equals plain curate over b1
    assert(keptSet(kept1) == keptSet(Curation.curate(b1)))
    // every cross-batch path actually fired
    val ids2 = keptSet(kept2).map(_._1)
    assert(ids2.nonEmpty && ids2.forall(i => i >= 300L && i < 400L))
    assert(ids2 == (0L until 30L by 3L).map(300L + _).toSet)
  }

  test("artifacts roll forward to the full-rebuild artifacts") {
    val (_, art1) = Curation.artifactsOf(b1, sourceCol = Some("source"))
    val (_, art2) = Curation.curateIncremental(b2, art1,
      sourceCol = Some("source"))
    val union = b1.unionByName(b2)
    val (_, full) = Curation.artifactsOf(union, sourceCol = Some("source"))
    assert(rows(art2.hashReps) == rows(full.hashReps))
    assert(rows(art2.signed.select("doc_id")) ==
      rows(full.signed.select("doc_id")))
    assert(rows(art2.clusters) == rows(full.clusters))
    assert(rows(art2.clusters).nonEmpty)
    assert(rows(art2.lineCensus) == rows(full.lineCensus))
    assert(rows(art2.sourceCounts.get) == rows(full.sourceCounts.get))
    assert(rows(art2.model._1) == rows(full.model._1))
    assert(rows(art2.model._2) == rows(full.model._2))
  }

  test("a smaller-id newcomer takes representation; verdict identity holds") {
    // b2 doc with id SMALLER than its b1 exact-dup: the newcomer wins the
    // hash group in both the incremental path and the full re-run
    val b1b = df(Seq((50L, text(1000L), "web"), (51L, text(1001L), "web")))
    val b2b = df(Seq((7L, text(1000L), "web"), (52L, text(1002L), "web")))
    val (_, art) = Curation.artifactsOf(b1b)
    val (kept2, art2) = Curation.curateIncremental(b2b, art)
    val full = Curation.curate(b1b.unionByName(b2b))
    assert(keptSet(kept2) ==
      keptSet(full.filter(col("doc_id") === 7L || col("doc_id") === 52L)))
    assert(keptSet(kept2).map(_._1) == Set(7L, 52L))
    // the demoted (pairless) rep 50 is no longer signed: artifacts equal
    // a full rebuild even though batch ids are not monotone
    val (_, fullArt) = Curation.artifactsOf(b1b.unionByName(b2b))
    assert(rows(art2.hashReps) == rows(fullArt.hashReps))
    assert(rows(art2.signed.select("doc_id")) ==
      rows(fullArt.signed.select("doc_id")))
    assert(rows(art2.clusters) == rows(fullArt.clusters))
  }

  test("a demoted cluster representative's rows do not roll forward") {
    // b1: 50 reps a REAL near-dup cluster {50, 60}; b2's doc 7 is an
    // exact dup of 50 with a smaller id, demoting it. The full rebuild
    // signs/clusters 7 in 50's place; the increment must converge to the
    // same artifacts — 7 inherits 50's pairs through its identical
    // signature, and 50's rows are dropped.
    val base = text(2000L)
    val b1c = df(Seq((50L, base, "web"), (60L, trunc(base, 5), "web"),
      (51L, text(2001L), "web")))
    val b2c = df(Seq((7L, base, "web"), (8L, text(2002L), "web")))
    val (_, art1) = Curation.artifactsOf(b1c)
    assert(rows(art1.clusters).contains(Seq(60L, 50L))) // precondition
    val (kept2, art2) = Curation.curateIncremental(b2c, art1)
    val full = Curation.curate(b1c.unionByName(b2c))
    assert(keptSet(kept2) == keptSet(full.filter(col("doc_id") < 50L)))
    assert(keptSet(kept2).map(_._1) == Set(7L, 8L))
    val (_, fullArt) = Curation.artifactsOf(b1c.unionByName(b2c))
    assert(rows(art2.hashReps) == rows(fullArt.hashReps))
    assert(rows(art2.signed.select("doc_id")) ==
      rows(fullArt.signed.select("doc_id")))
    assert(rows(art2.clusters) == rows(fullArt.clusters))
    // and concretely: 7 took over as the cluster's representative
    assert(rows(art2.clusters) == Set(Seq(60L, 7L), Seq(7L, 7L)))
  }

  test("a second incremental batch composes, relabeling through old clusters") {
    val b3 = df(Seq(
      (600L, text(77L), "web"),                 // fresh -> kept
      (601L, text(0L), "web"),                  // exact dup of b1's 0
      (603L, trunc(rev(text(0L)), 3), "books"))) // near-dups b2's {300,500}
    val (_, art1) = Curation.artifactsOf(b1, sourceCol = Some("source"))
    val (_, art2) = Curation.curateIncremental(b2, art1,
      sourceCol = Some("source"))
    // precondition for the relabel path: b2's round left a real cluster
    // containing 300 (rep) and 500
    assert(rows(art2.clusters).contains(Seq(500L, 300L)))
    val (kept3, art3) = Curation.curateIncremental(b3, art2,
      sourceCol = Some("source"))
    val full = Curation.curate(b1.unionByName(b2).unionByName(b3))
    assert(keptSet(kept3) == keptSet(full.filter(col("doc_id") >= 600L)))
    assert(keptSet(kept3).map(_._1) == Set(600L))
    // artifacts still equal a full rebuild after two increments
    val (_, fullArt) = Curation.artifactsOf(
      b1.unionByName(b2).unionByName(b3), sourceCol = Some("source"))
    assert(rows(art3.hashReps) == rows(fullArt.hashReps))
    assert(rows(art3.clusters) == rows(fullArt.clusters))
    assert(rows(art3.clusters).contains(Seq(603L, 300L)))
  }

  test("the model gate composes: incremental identity, additive counts") {
    // frozen classifier that rejects doc 5's family: its unique token
    // t5x0 carries a large negative weight; every other token is OOV
    // (+1), so all other docs score positive
    val clf = QualityModel.LocalClassifier(
      Map("t5x0" -> -100000000L), oovWeight = 1L, vocabV = 1L)
    val (kept1, art1) = Curation.artifactsOf(b1, sourceCol = Some("source"),
      classifier = Some(clf), trainQuality = true)
    val (kept2, art2) = Curation.curateIncremental(b2, art1,
      sourceCol = Some("source"), classifier = Some(clf))
    val full = Curation.curate(b1.unionByName(b2), classifier = Some(clf))
    assert(keptSet(kept2) == keptSet(full.filter(col("doc_id") >= 100L)))
    // the gate actually bites: doc 5 survives ungated curation but not
    // the model-gated one (and neither does its b2 exact dup 105)
    assert(keptSet(Curation.curate(b1)).map(_._1).contains(5L))
    assert(!keptSet(kept1).map(_._1).contains(5L))
    assert(!keptSet(kept2).map(_._1).contains(105L))
    // classifier-training counts roll forward to the full-rebuild counts
    val (_, fullArt) = Curation.artifactsOf(b1.unionByName(b2),
      sourceCol = Some("source"), trainQuality = true)
    assert(rows(art2.qualityCounts.get) == rows(fullArt.qualityCounts.get))
    assert(rows(art2.qualityCounts.get).nonEmpty)
  }

  test("a half-configured sourceCol roll-forward fails loudly") {
    val (_, withCounts) = Curation.artifactsOf(b1, sourceCol = Some("source"))
    val (_, noCounts) = Curation.artifactsOf(b1)
    // dropping the artifact (or bootstrapping from one batch) would be
    // silent census corruption — both directions must be loud
    val e1 = intercept[IllegalArgumentException](
      Curation.curateIncremental(b2, withCounts))
    assert(e1.getMessage.contains("sourceCol"))
    val e2 = intercept[IllegalArgumentException](
      Curation.curateIncremental(b2, noCounts, sourceCol = Some("source")))
    assert(e2.getMessage.contains("sourceCounts"))
  }

  test("LM threshold view over the merged unpruned model matches retrain") {
    // the minCount discipline: persist at 1, threshold at scoring time
    val (_, art1) = Curation.artifactsOf(b1)
    val (_, art2) = Curation.curateIncremental(b2, art1)
    val union = b1.unionByName(b2)
    val retrained = LangModel.bigramCounts(
      TextAnalysis.withQuality(
        TextAnalysis.withLangId(union, "text"), "text")
        .filter(col("quality_bucket") =!= "too_short"),
      minCount = 2)
    assert(rows(art2.model._1.filter(col("n12") >= 2)) == rows(retrained))
  }
}
