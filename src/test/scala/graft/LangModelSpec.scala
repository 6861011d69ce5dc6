package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{LangModel, Sampling, TextAnalysis}

/** Bigram-LM fluency scoring, temperature mixing, and TF-IDF distinctive
  * terms: the per-operator invariants that the oracle's aggregate compare
  * can't isolate (hand-computed tiny-corpus scores, proportionality of
  * mixing rates, rank determinism). */
class LangModelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bigramsOf zips adjacent words and survives short docs") {
    val out = Seq("a b c d", "solo", "", null.asInstanceOf[String])
      .toDF("text")
      .select(LangModel.bigramsOf(graft.llm.TextHash.words(col("text")))
        .as("bg"))
      .as[Seq[(String, String)]].collect()
    assert(out(0) == Seq(("a", "b"), ("b", "c"), ("c", "d")))
    assert(out(1) == Seq.empty)
    assert(out(2) == Seq.empty)
    assert(out(3) == null) // null text → null words → null bigrams
  }

  test("scoreDocs matches a hand-computed add-one-smoothed model") {
    // reference: "a b a b" → bigrams (a,b)x2, (b,a)x1; unigrams a:2 b:2
    // V = 2
    val ref = Seq("a b a b").toDF("text")
    val bg = LangModel.bigramCounts(ref)
    val uni = LangModel.unigramCounts(ref)
    assert(bg.as[(String, String, Long)].collect().toSet ==
      Set(("a", "b", 2L), ("b", "a", 1L)))

    val docs = Seq((1L, "a b"), (2L, "z z"), (3L, "a")).toDF("doc_id", "text")
    val out = LangModel.scoreDocs(docs, bg, uni)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // doc 1: one bigram (a,b): ln((2+1)/(2+2)) = ln(0.75)
    val lp1 = math.floor(1e6 * math.log(3.0 / 4.0)).toLong
    assert(out(1L) == ((1L, 0L, lp1)))
    // doc 2: one bigram (z,z), OOV: ln((0+1)/(0+2)) = ln(0.5)
    val lp2 = math.floor(1e6 * math.log(0.5)).toLong
    assert(out(2L) == ((1L, 1L, lp2)))
    // doc 3: no bigrams
    assert(out(3L) == ((0L, 0L, 0L)))
  }

  test("minCount prunes the bigram tail") {
    val ref = Seq("a b a b c").toDF("text")
    val kept = LangModel.bigramCounts(ref, minCount = 2)
      .as[(String, String, Long)].collect().toSet
    assert(kept == Set(("a", "b", 2L))) // (b,a) and (b,c) are singletons
  }

  test("temperature rates: rarest stratum keeps all, kept ∝ n^alpha") {
    val docs = spark.range(0, 1200)
      .select(col("id").as("doc_id"),
        when(col("id") < 900, "big").otherwise("small").as("lang"))
    val rates = Sampling.temperatureRates(docs, "lang")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rates("small") == ((300L, 1000000L))) // sqrt(300/300) = 1
    // sqrt(300/900) = 0.57735… → 577350 per-million
    assert(rates("big")._2 == math.floor(1e6 * math.sqrt(300.0 / 900.0)).toLong)

    val kept = Sampling.temperatureMix(docs, "lang")
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(kept("small") == 300L) // rate 1.0 keeps everything
    // expected 900 * 0.5774 ≈ 520; md5 uniformity keeps it in a loose band
    assert(kept("big") > 450 && kept("big") < 590)
  }

  test("temperature mix is deterministic and partitioning-independent") {
    val docs = spark.range(0, 500)
      .select(col("id").as("doc_id"),
        (col("id") % 3).cast("string").as("lang"))
    val a = Sampling.temperatureMix(docs, "lang")
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.temperatureMix(docs.repartition(11, col("doc_id")), "lang")
      .select("doc_id").as[Long].collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("broadcast scoring equals join scoring, batch and streamed") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val ref = Seq("the cat sat on the mat", "the cat ran", "el gato corre")
      .toDF("text")
    val bg = LangModel.bigramCounts(ref)
    val uni = LangModel.unigramCounts(ref)
    val model = LangModel.collectModel(bg, uni)
    val rows = Seq(
      (1L, "the cat sat"), (2L, "completely unseen words here"),
      (3L, "el gato"), (4L, ""), (5L, "the"))
    val docs = rows.toDF("doc_id", "text")

    val joined = LangModel.scoreDocs(docs, bg, uni)
      .as[(Long, Long, Long, Long)].collect().toSet
    val broad = LangModel.scoreDocsBroadcast(docs, model)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(broad == joined)

    // stateless per-row → identical under Structured Streaming
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, String)]
    val q = LangModel.scoreDocsBroadcast(src.toDF().toDF("doc_id", "text"),
        model)
      .writeStream.format("memory").queryName("lm_out")
      .outputMode("append").start()
    src.addData(rows.take(2)); q.processAllAvailable()
    src.addData(rows.drop(2)); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("lm_out")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(streamed == joined)
  }

  test("a persisted model scores identically after reopen") {
    val ref = Seq("a b a b c", "b c d").toDF("text")
    val bg = LangModel.bigramCounts(ref, minCount = 2)
    val uni = LangModel.unigramCounts(ref)
    val dir = java.nio.file.Files.createTempDirectory("graft-lm").toString
    LangModel.writeModel(bg, uni, dir)
    val (bg2, uni2) = LangModel.readModel(spark, dir)
    val docs = Seq((1L, "a b c d"), (2L, "z a")).toDF("doc_id", "text")
    val fresh = LangModel.scoreDocs(docs, bg, uni)
      .as[(Long, Long, Long, Long)].collect().toSet
    val reopened = LangModel.scoreDocs(docs, bg2, uni2)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(fresh == reopened)
    // and the broadcast path agrees with the reopened model too
    val broad = LangModel.scoreDocsBroadcast(
        docs, LangModel.collectModel(bg2, uni2))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(broad == fresh)
  }

  test("broadcast scoring preserves non-numeric id types") {
    val ref = Seq("a b a").toDF("text")
    val model = LangModel.collectModel(
      LangModel.bigramCounts(ref), LangModel.unigramCounts(ref))
    val docs = Seq(("doc-1", "a b"), ("doc-2", "z z"))
      .toDF("doc_id", "text")
    val out = LangModel.scoreDocsBroadcast(docs, model)
    assert(out.schema("doc_id").dataType ==
      org.apache.spark.sql.types.StringType)
    val byId = out.as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(byId.keySet == Set("doc-1", "doc-2"))
    assert(byId("doc-2")._3 == 1L) // the OOV bigram is counted
  }

  test("an empty reference model fails loudly on both scoring paths") {
    val emptyRef = Seq.empty[String].toDF("text")
    val bg = LangModel.bigramCounts(emptyRef)
    val uni = LangModel.unigramCounts(emptyRef)
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    // join path: the assert_true guard fires during execution
    val ex = intercept[Exception] {
      LangModel.scoreDocs(docs, bg, uni).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(c =>
      c.getMessage != null && c.getMessage.contains("empty reference model")))
    // broadcast path: rejected at construction
    val ex2 = intercept[IllegalArgumentException] {
      LangModel.scoreDocsBroadcast(docs,
        LangModel.collectModel(bg, uni))
    }
    assert(ex2.getMessage.contains("empty reference model"))
  }

  test("null strata neither crush rates nor survive the mix") {
    val docs = spark.range(0, 400)
      .select(col("id").as("doc_id"),
        when(col("id") < 4, lit(null).cast("string")) // tiny null group
          .when(col("id") < 300, "big").otherwise("small").as("lang"))
    val rates = Sampling.temperatureRates(docs, "lang")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // the 4-row null group must NOT become n_min (it would crush "big"
    // to sqrt(4/296)); rarest REAL stratum (small, 100) keeps all
    assert(rates.keySet == Set("big", "small"))
    assert(rates("small")._2 == 1000000L)
    val kept = Sampling.temperatureMix(docs, "lang")
    assert(kept.filter(col("lang").isNull).count() == 0)
  }

  test("frozen-rate mixing is batch/stream identical") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rows = (0L until 300L).map(i => (i, if (i < 240) "big" else "small"))
    val batchDocs = rows.toDF("doc_id", "lang")
    val rates = Sampling.temperatureRates(batchDocs, "lang")
      .localCheckpoint(true) // freeze the snapshot the stream joins
    val batch = Sampling.temperatureMixWith(batchDocs, rates, "lang")
      .select("doc_id").as[Long].collect().toSet

    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, String)]
    val q = Sampling.temperatureMixWith(
        src.toDF().toDF("doc_id", "lang"), rates, "lang")
      .select("doc_id")
      .writeStream.format("memory").queryName("mix_out")
      .outputMode("append").start()
    src.addData(rows.take(100)); q.processAllAvailable()
    src.addData(rows.drop(100)); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("mix_out").as[Long].collect().toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("verbatim overlap pairs originals with their truncated variants") {
    val base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
    val docs = Seq(
      (1L, base),
      (2L, base + " tail1 tail2"),     // shares all of doc 1's windows
      (3L, "a b c d e f g h i j k l"), // disjoint
      (4L, "w5 w6 w7 w8 w9 w10 w11 w12 x y")) // shares a suffix span
      .toDF("doc_id", "text")
    val pairs = graft.llm.Dedup.verbatimOverlapPairs(docs, shingleN = 8,
        minShared = 2)
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // doc 1 has 5 windows of 8 words; doc 2 contains every one of them.
    // docs 1/4 and 2/4 share exactly ONE window ([w5..w12]) → cut by
    // minShared=2; doc 3 shares nothing. Only (1,2) survives.
    assert(pairs == Map((1L, 2L) -> 5L))
  }

  test("boilerplate grams are capped out of verbatim pair generation") {
    // 70 docs all containing the same 8-word span: the span's gram is
    // shared by 70 > maxGramDocs=64 docs and must generate NO pairs
    val span = "b1 b2 b3 b4 b5 b6 b7 b8"
    val docs = (0L until 70L).map(i => (i, s"u$i " + span))
      .toDF("doc_id", "text")
    val pairs = graft.llm.Dedup.verbatimOverlapPairs(docs, shingleN = 8,
      minShared = 1)
    assert(pairs.count() == 0)
  }

  test("distinctiveTerms counts a duplicated doc row once in df") {
    val docs = Seq(
      (1L, "s1", "alpha common"),
      (1L, "s1", "alpha common"), // same doc_id delivered twice
      (2L, "s2", "beta common")).toDF("doc_id", "source", "text")
    val out = TextAnalysis.distinctiveTerms(docs, k = 2)
      .as[(String, String, Long, Long)].collect()
    // df(common) must be 2 docs (not 3 rows): idf = ln(4/3) > 0, so
    // "common" keeps a positive score in both sources
    val common = out.filter(_._2 == "common")
    assert(common.nonEmpty && common.forall(_._4 > 0))
  }

  test("incremental model update equals retraining on the union") {
    val ref1 = Seq("a b a b", "c d").toDF("text")
    val ref2 = Seq("a b c", "b a").toDF("text")
    val union = ref1.unionByName(ref2)
    val (ubg, uuni) = LangModel.updateModel(
      (LangModel.bigramCounts(ref1), LangModel.unigramCounts(ref1)), ref2)
    def bgSet(df: org.apache.spark.sql.DataFrame) =
      df.as[(String, String, Long)].collect().toSet
    def uniSet(df: org.apache.spark.sql.DataFrame) =
      df.as[(String, Long)].collect().toSet
    assert(bgSet(ubg) == bgSet(LangModel.bigramCounts(union)))
    assert(uniSet(uuni) == uniSet(LangModel.unigramCounts(union)))
    // and scoring through the merged model matches the retrained one
    val docs = Seq((1L, "a b c"), (2L, "d c")).toDF("doc_id", "text")
    assert(
      LangModel.scoreDocs(docs, ubg, uuni)
        .as[(Long, Long, Long, Long)].collect().toSet ==
        LangModel.scoreDocs(docs, LangModel.bigramCounts(union),
            LangModel.unigramCounts(union))
          .as[(Long, Long, Long, Long)].collect().toSet)
  }

  test("distinctiveTerms ranks group-heavy tokens above ubiquitous ones") {
    val docs = Seq(
      (1L, "s1", "alpha alpha alpha common"),
      (2L, "s1", "alpha common"),
      (3L, "s2", "beta beta common"),
      (4L, "s2", "beta common")).toDF("doc_id", "source", "text")
    val out = TextAnalysis.distinctiveTerms(docs, k = 1)
      .as[(String, String, Long, Long)].collect()
      .map(r => r._1 -> r._2).toMap
    // "common" appears in every doc → idf = ln(5/5) = 0 → score 0;
    // the group-specific token wins each source
    assert(out == Map("s1" -> "alpha", "s2" -> "beta"))
  }

  test("distinctiveTerms emits exactly k rows per group with total-order ties") {
    val docs = Seq(
      (1L, "s1", "t1 t2 t3 t4"),
      (2L, "s2", "t1 t2 t3 t4")).toDF("doc_id", "source", "text")
    // every token has identical tf and df → identical score; the token
    // tie-break must make the k-cut deterministic
    val out = TextAnalysis.distinctiveTerms(docs, k = 2)
      .orderBy("source", "token")
      .as[(String, String, Long, Long)].collect()
    assert(out.map(r => (r._1, r._2)).toSeq ==
      Seq(("s1", "t1"), ("s1", "t2"), ("s2", "t1"), ("s2", "t2")))
  }
}
