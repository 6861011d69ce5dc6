package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Dedup

/** Corpus-level line dedup (C4-style boilerplate removal): census
  * threshold, distinct-document counting, the minChars gate, order
  * preservation, and the emptied-document contract. */
class LineDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Boiler = "subscribe to the newsletter today"

  private def run(docs: Seq[(Long, String)], minCount: Int = 3) =
    Dedup.lineDedup(docs.toDF("doc_id", "text"), minCount = minCount)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> r).toMap

  test("a line in >= minCount docs is removed from every carrier") {
    val got = run(Seq(
      1L -> s"alpha content one\n$Boiler\nmore alpha text",
      2L -> s"$Boiler\nbeta content two",
      3L -> s"gamma content three\n$Boiler",
      4L -> "delta has no boilerplate at all"))
    assert(got(1L) == (1L, "alpha content one\nmore alpha text", 3L, 1L))
    assert(got(2L) == (2L, "beta content two", 2L, 1L))
    assert(got(3L) == (3L, "gamma content three", 2L, 1L))
    assert(got(4L) == (4L, "delta has no boilerplate at all", 1L, 0L))
  }

  test("a line in fewer docs than minCount is kept") {
    val got = run(Seq(
      1L -> s"$Boiler\nunique one",
      2L -> s"$Boiler\nunique two",
      3L -> "unrelated document text"))
    assert(got(1L)._4 == 0L && got(2L)._4 == 0L)
    assert(got(1L)._2 == s"$Boiler\nunique one")
  }

  test("within-doc stutter is repetition, not boilerplate (distinct docs)") {
    // the line appears 3x but in only ONE document → kept
    val got = run(Seq(
      1L -> s"$Boiler\n$Boiler\n$Boiler",
      2L -> "other text entirely here",
      3L -> "third text entirely here"))
    assert(got(1L) == (1L, s"$Boiler\n$Boiler\n$Boiler", 3L, 0L))
  }

  test("short lines never enter the census (minChars gate)") {
    // "ok" repeats across every doc but is under 10 chars → kept
    val got = run(Seq(
      1L -> "ok\nalpha body text",
      2L -> "ok\nbeta body text",
      3L -> "ok\ngamma body text"))
    assert(got.values.forall(_._4 == 0L))
    assert(got(1L)._2 == "ok\nalpha body text")
  }

  test("a NULL-text document keeps its row (empty cleaned text)") {
    val got = run(Seq(
      1L -> null,
      2L -> "real content line here",
      3L -> "other content line here"))
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L) == (1L, "", 1L, 0L))
  }

  test("line dedup is idempotent and identity on boilerplate-free corpora") {
    val dirty = Seq(
      1L -> s"alpha content one\n$Boiler",
      2L -> s"$Boiler\nbeta content two",
      3L -> s"gamma content three\n$Boiler")
    val once = Dedup.lineDedup(dirty.toDF("doc_id", "text"))
      .select("doc_id", "text")
    // second pass over the cleaned corpus removes nothing
    val twice = Dedup.lineDedup(once)
    assert(twice.as[(Long, String, Long, Long)].collect()
      .forall(_._4 == 0L))
    // a corpus with no corpus-repeated line passes through text-unchanged
    val clean = Seq(1L -> "solo alpha line\nsecond alpha line",
      2L -> "solo beta line here").toDF("doc_id", "text")
    val out = Dedup.lineDedup(clean).select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "solo alpha line\nsecond alpha line",
      2L -> "solo beta line here"))
  }

  test("incremental census merge equals the full-corpus census") {
    val docs = Seq(
      1L -> s"$Boiler\nalpha body text",
      2L -> s"$Boiler\nbeta body text",
      3L -> s"$Boiler\ngamma body text",
      4L -> "gamma body text\ndelta body text")
    val full = Dedup.lineCensus(docs.toDF("doc_id", "text"))
      .as[(String, Long)].collect().toSet
    val merged = Dedup.mergeLineCensus(
        Dedup.lineCensus(docs.take(2).toDF("doc_id", "text")),
        docs.drop(2).toDF("doc_id", "text"))
      .as[(String, Long)].collect().toSet
    assert(merged == full)
    assert(full.map(_._2).max == 3L) // the boilerplate line counts 3 docs
  }

  test("surviving lines keep original order; emptied docs yield empty text") {
    val got = run(Seq(
      1L -> s"first kept line\n$Boiler\nsecond kept line\nthird kept line",
      2L -> Boiler,
      3L -> s"$Boiler\nsolo survivor line"))
    assert(got(1L)._2 == "first kept line\nsecond kept line\nthird kept line")
    assert(got(2L) == (2L, "", 1L, 1L))
    assert(got(3L)._2 == "solo survivor line")
  }
}
