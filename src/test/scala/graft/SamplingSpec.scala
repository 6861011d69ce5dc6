package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{Pii, Sampling, TextAnalysis}

/** The properties that make hash-based splitting/sampling usable where
  * rand() is not: determinism, partitioning independence, and exact
  * split partitioning of the corpus. */
class SamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = spark.range(0, 1000)
    .select(col("id").as("doc_id"),
      (col("id") % 5).cast("string").as("lang"))

  test("split assignment is deterministic and partitioning-independent") {
    val a = Sampling.withSplit(docs).select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    val b = Sampling.withSplit(docs.repartition(7, col("lang")))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(a == b)
    // every doc lands in exactly one split, none dropped
    assert(a.size == 1000)
    assert(a.values.toSet == Set("train", "val", "test"))
  }

  test("split fractions track the requested percentages") {
    val n = Sampling.withSplit(docs).groupBy("split").count()
      .as[(String, Long)].collect().toMap
    // md5 buckets are uniform-ish; 90/5/5 over 1000 ids lands within a
    // loose band (exactness is per-bucket, not per-count)
    assert(n("train") > 850 && n("train") < 950)
    assert(n("val") > 20 && n("val") < 90)
    assert(n("test") > 20 && n("test") < 90)
  }

  test("stratified sample is a subset, deterministic, and rate-ordered") {
    val rates = Seq("0" -> 1000, "1" -> 500, "2" -> 0)
    val kept = Sampling.stratifiedSample(docs, "lang", rates,
      defaultPermille = 100)
    val k1 = kept.select("doc_id").as[Long].collect().toSet
    val k2 = Sampling.stratifiedSample(docs.repartition(13), "lang", rates,
      defaultPermille = 100).select("doc_id").as[Long].collect().toSet
    assert(k1 == k2)
    val byLang = kept.groupBy("lang").count().as[(String, Long)]
      .collect().toMap
    assert(byLang("0") == 200)           // permille 1000 keeps everything
    assert(!byLang.contains("2"))        // permille 0 keeps nothing
    assert(byLang("1") > 60 && byLang("1") < 140)   // ~half of 200
    assert(byLang.getOrElse("3", 0L) < byLang("1")) // default 100 < 500
  }

  test("sample and split hashes are independent (distinct salts)") {
    // if the same hash drove both, every sampled doc would sit in the
    // same split band; with distinct salts the split census of a 50%
    // sample still covers all three splits
    val sampled = Sampling.stratifiedSample(docs, "lang",
      rates = Nil, defaultPermille = 500)
    val splits = Sampling.withSplit(sampled).select("split").distinct()
      .as[String].collect().toSet
    assert(splits == Set("train", "val", "test"))
  }

  test("pii redaction replaces exactly what it counts") {
    val df = Seq(
      (1L, "mail a.b-c@x-y.example.org and 10.0.0.1 then 555-123-4567"),
      (2L, "no pii here"),
      (3L, "two mails a@b.co c@d.io one ip 255.255.255.255"))
      .toDF("doc_id", "text")
    val out = Pii.withPiiRedaction(df)
      .select("doc_id", "n_emails", "n_phones", "n_ips", "redacted")
      .as[(Long, Int, Int, Int, String)].collect().sortBy(_._1)
    assert(out(0) == ((1L, 1, 1, 1,
      s"mail ${Pii.EmailToken} and ${Pii.Ipv4Token} then ${Pii.PhoneToken}")))
    assert(out(1) == ((2L, 0, 0, 0, "no pii here")))
    assert(out(2)._2 == 2 && out(2)._4 == 1)
    assert(!out.exists(r => r._5.contains("@") && r._2 > 0))
  }

  test("overlapping spans are counted once, on the text a prior pass left") {
    // the IP inside the email's domain is consumed by the email pass;
    // counting on raw text would report an IP the redaction never made
    val df = Seq((1L, "mail bob@1.2.3.4.example.com now"))
      .toDF("doc_id", "text")
    val out = Pii.withPiiRedaction(df)
      .select("n_emails", "n_ips", "n_phones", "redacted")
      .as[(Int, Int, Int, String)].head()
    assert(out == ((1, 0, 0, s"mail ${Pii.EmailToken} now")))
  }

  test("repetition signals on known shapes") {
    val df = Seq(
      (1L, "a a a a a a"),        // pure stutter
      (2L, "a b c d e f"),        // no repetition
      (3L, "x y x y x y x y"),    // alternating bigram boilerplate
      (4L, "a b"))                // shorter than the 3-gram window
      .toDF("doc_id", "text")
    val out = TextAnalysis.withRepetition(df)
      .select("doc_id", "n_words", "n_distinct_words", "adj_dups",
        "n_3grams", "top_3gram_n", "repetitive")
      .as[(Long, Int, Int, Int, Int, Int, Boolean)].collect()
      .sortBy(_._1)
    assert(out(0) == ((1L, 6, 1, 5, 4, 4, true)))
    assert(out(1) == ((2L, 6, 6, 0, 4, 1, false)))
    // "x y x y x y x y": 6 3-grams, top ("x y x" or "y x y") appears 3×
    assert(out(2) == ((3L, 8, 2, 0, 6, 3, true)))
    assert(out(3) == ((4L, 2, 2, 0, 0, 0, false)))
  }
}
