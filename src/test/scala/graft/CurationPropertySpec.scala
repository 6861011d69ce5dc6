package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{Pii, Quantize, Sampling}

/** Property pins for the curation operators, driven by deterministic
  * generated corpora (fixed seed): the invariants hold over arbitrary
  * inputs, not just the handwritten fixtures. */
class CurationPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def gen[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("property: quantization codes stay in range, error within one step") {
    val vecs = gen(Gen.listOfN(300, for {
      dim <- Gen.chooseNum(1, 16)
      v <- Gen.listOfN(dim, Gen.chooseNum(-1000.0, 1000.0))
    } yield v.map(_.toFloat)), 7L)
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    val checked = Quantize.quantError(Quantize.withQuantized(df))
      .select(col("vec_id"), col("max_err_scaled"),
        floor(col("q_scale") * 1e6).cast("long").as("step_scaled"))
      .as[(Long, Long, Long)].collect()
    assert(checked.length == 300)
    checked.foreach { case (id, err, step) =>
      assert(err <= step + 1, s"vec $id: error $err exceeds step $step")
    }
    val codeRange = Quantize.withQuantized(df)
      .select(explode(col("q_codes")).as("c"))
      .filter(col("c") < 0 || col("c") > Quantize.Levels)
    assert(codeRange.count() == 0)
  }

  test("property: LM broadcast and join scoring agree on generated corpora") {
    import graft.llm.LangModel
    val word = Gen.oneOf("a", "b", "c", "dd", "ee", "ünï", "9", "the")
    def corpus(n: Int, seed: Long) =
      gen(Gen.listOfN(n, for {
        k <- Gen.chooseNum(0, 12)
        ws <- Gen.listOfN(k, word)
      } yield ws.mkString(" ")), seed)
    val ref = corpus(60, 21L).toDF("text")
    val docs = corpus(200, 22L).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val bg = LangModel.bigramCounts(ref, minCount = 2)
    val uni = LangModel.unigramCounts(ref)
    val joined = LangModel.scoreDocs(docs, bg, uni)
      .as[(Long, Long, Long, Long)].collect().toSet
    val broad = LangModel.scoreDocsBroadcast(docs,
        LangModel.collectModel(bg, uni))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(broad == joined && joined.size == 200)
    // score sanity over arbitrary inputs: p ≤ 1 always (c12 ≤ c1,
    // V ≥ 1) so lp_micro ≤ 0, and OOV never exceeds the bigram count
    joined.foreach { case (id, nb, oov, lp) =>
      assert(lp <= 0L, s"doc $id: positive log-likelihood $lp")
      assert(oov <= nb, s"doc $id: oov $oov > n_bigrams $nb")
    }
  }

  test("property: pii redaction is idempotent (tokens contain no matches)") {
    val word = Gen.oneOf("alpha", "beta", "x1", "the", "9")
    val piiBit = Gen.oneOf(
      "a.b-c@x.example.org", "555-321-9876", "10.1.2.3", "plain")
    val texts = gen(Gen.listOfN(200, for {
      ws <- Gen.listOfN(6, word)
      p <- piiBit
      q <- piiBit
    } yield (ws.take(3) ++ Seq(p) ++ ws.drop(3) ++ Seq(q)).mkString(" ")), 13L)
    val once = Pii.withPiiRedaction(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text"))
      .select(col("doc_id"), col("redacted"))
    val twice = Pii.withPiiRedaction(once.withColumnRenamed("redacted", "text"))
      .select(col("doc_id"), col("redacted").as("redacted2"))
    val diff = once.join(twice, "doc_id")
      .filter(col("redacted") =!= col("redacted2"))
    assert(diff.count() == 0)
  }

  test("property: split membership is a pure function of the id alone") {
    val ids = gen(Gen.listOfN(400,
      Gen.chooseNum(Long.MinValue + 1, Long.MaxValue - 1)), 23L).distinct
    val df = ids.map(Tuple1(_)).toDF("doc_id")
    def splits(d: org.apache.spark.sql.DataFrame) =
      Sampling.withSplit(d).select("doc_id", "split")
        .as[(Long, String)].collect().toMap
    val base = splits(df)
    // order, partitioning, and unrelated columns must not matter
    assert(splits(df.orderBy(col("doc_id").desc).repartition(17)) == base)
    assert(splits(df.withColumn("noise", rand(42))) == base)
    assert(base.size == ids.size)
  }
}
