package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GraftFunctions, LangScores}

/** Parity of the native tokenizer/scorer expressions against the column
  * forms they replaced. The parquet-roundtrip tests exercise the codegen
  * path; the local-Seq tests the interpreted path (see the
  * silent-codegen-fallback note in the repo docs: a Janino failure would
  * pass tests on the interpreted path, so codegen-path coverage is the
  * point). */
class WordsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Texts = Seq(
    "the quick brown fox",
    "  leading and   multiple   spaces  ",
    "tabs\tand\nnewlines stay glued",
    "",
    " ",
    "der le de shi the the une y",
    "unicode café 中文 ok",
    null)

  private def nativeWords(c: org.apache.spark.sql.Column) =
    call_function(GraftFunctions.WordsName, c)
  private def oldWords(c: org.apache.spark.sql.Column) =
    filter(split(c, " "), w => w =!= "")

  test("graft_words matches filter(split) on the codegen path") {
    val tmp = java.nio.file.Files.createTempDirectory("words").toString
    Texts.toDF("t").write.mode("overwrite").parquet(tmp)
    val df = spark.read.parquet(tmp)
    val diff = df.select(nativeWords(col("t")).as("a"),
        oldWords(col("t")).as("b"))
      .filter(!(col("a") <=> col("b")))
    assert(diff.count() == 0)
  }

  test("graft_words matches filter(split) on the interpreted path") {
    val got = Texts.toDF("t")
      .select(nativeWords(col("t")).as("a"), oldWords(col("t")).as("b"))
      .collect()
    got.foreach(r => assert(r.get(0) == r.get(1), s"mismatch on row $r"))
  }

  test("graft_lang_scores matches the per-language isin folds") {
    def oldHits(ws: org.apache.spark.sql.Column, stop: Seq[String]) =
      size(filter(ws, w => w.isin(stop.map(lit): _*)))
    val tmp = java.nio.file.Files.createTempDirectory("langsc").toString
    Texts.toDF("t").write.mode("overwrite").parquet(tmp)
    val ws = nativeWords(col("t"))
    val native = call_function(GraftFunctions.LangScoresName, ws)
    val allStops = LangScores.StopWords.flatMap(_._2).distinct
    val oldCols = LangScores.StopWords.map { case (_, stop) =>
      oldHits(ws, stop)
    } :+ oldHits(ws, allStops)
    // compare element-wise (what the operators consume): for NULL text
    // the native vector is NULL and element_at stays NULL, exactly like
    // each old fold — but array(old folds) would box those NULLs into a
    // non-null array, so a whole-array compare is the wrong parity
    val checks = oldCols.zipWithIndex.map { case (old, i) =>
      element_at(native, i + 1) <=> old
    }
    val diff = spark.read.parquet(tmp)
      .filter(!checks.reduce(_ && _))
    assert(diff.count() == 0)
  }

  test("graft_pos_fp matches the aggregate/transform fold (codegen path)") {
    import graft.llm.TextHash.{h32p, P}
    val tmp = java.nio.file.Files.createTempDirectory("posfp").toString
    // >64 words exercises the (i % 64) weight wrap
    (Texts :+ (("w " * 200).trim)).toDF("t")
      .write.mode("overwrite").parquet(tmp)
    val ws = nativeWords(col("t"))
    val old = aggregate(
      transform(ws, (w, i) => h32p(w) * ((i % 64) + 1)),
      lit(0L), (acc, v) => acc + v) % P
    val diff = spark.read.parquet(tmp)
      .select(call_function(GraftFunctions.PosFpName, ws).as("a"),
        old.as("b"))
      .filter(!(col("a") <=> col("b")))
    assert(diff.count() == 0)
  }

  test("property: natives match their column forms on generated strings") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def gen[A](g: Gen[A], seed: Long): A =
      g.apply(Gen.Parameters.default, Seed(seed)).get
    // strings over a hostile alphabet: spaces (runs), tabs/newlines,
    // multibyte, stopwords from several languages, punctuation
    val token = Gen.oneOf(" ", " ", "  ", "\t", "\n", "the", "de", "le",
      "und", "café", "中文", "a", "!", "x9", "", "d'a")
    val texts = gen(Gen.listOfN(400,
      Gen.listOf(token).map(_.mkString)), 11L)
    val tmp = java.nio.file.Files.createTempDirectory("wprop").toString
    texts.toDF("t").write.mode("overwrite").parquet(tmp)
    val ws = nativeWords(col("t"))
    import graft.llm.TextHash.{h32p, P}
    val posOld = aggregate(
      transform(ws, (w, i) => h32p(w) * ((i % 64) + 1)),
      lit(0L), (acc, v) => acc + v) % P
    def oldHits(stop: Seq[String]) =
      size(filter(ws, w => w.isin(stop.map(lit): _*)))
    val native = call_function(GraftFunctions.LangScoresName, ws)
    val checks = (LangScores.StopWords.map(_._2) :+
        LangScores.StopWords.flatMap(_._2).distinct)
      .zipWithIndex.map { case (stop, i) =>
        element_at(native, i + 1) <=> oldHits(stop)
      } ++ Seq(
        ws <=> oldWords(col("t")),
        call_function(GraftFunctions.PosFpName, ws) <=> posOld)
    val diff = spark.read.parquet(tmp).filter(!checks.reduce(_ && _))
    assert(diff.count() == 0)
  }

  test("union count is not the per-language sum (overlapping sets)") {
    // "de" is in the es/fr/zh lists: three per-language hits, ONE union hit
    val got = Seq("de").toDF("t")
      .select(call_function(GraftFunctions.LangScoresName,
        nativeWords(col("t"))).as("s"))
      .as[Seq[Int]].head()
    assert(got == Seq(0, 0, 1, 1, 1, 1))
  }
}
