package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.QualityModel

/** Naive-Bayes quality classifier: hand-computed tiny-corpus weights,
  * count additivity (the incremental-training invariant), join-vs-
  * broadcast path parity, and the loud empty-model guard — the
  * per-operator invariants the oracle's aggregate compare can't
  * isolate. */
class QualityModelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def labeled = Seq(
    (true, "good clean prose"),
    (true, "clean prose here"),
    (false, "spam spam junk"),
    (false, null.asInstanceOf[String])).toDF("label", "text")

  test("tokenClassCounts counts per class; null text contributes nothing") {
    val out = QualityModel.tokenClassCounts(labeled)
      .as[(String, Long, Long)].collect()
      .map { case (t, a, b) => t -> ((a, b)) }.toMap
    assert(out("clean") == ((2L, 0L)))
    assert(out("prose") == ((2L, 0L)))
    assert(out("spam") == ((0L, 2L)))
    assert(out("junk") == ((0L, 1L)))
    assert(out("good") == ((1L, 0L)))
    assert(out("here") == ((1L, 0L)))
    assert(out.size == 6)
  }

  test("scoreQuality matches hand-computed micro-nat log-odds") {
    // counts above: tot_pos = 6, tot_neg = 3, V = 6
    // (good, clean, prose, here, spam, junk)
    val counts = QualityModel.tokenClassCounts(labeled)
    def side(n: Long, tot: Long): Long =
      math.floor(1e6 * math.log((n + 1).toDouble / (tot + 6))).toLong
    def w(np: Long, nn: Long): Long = side(np, 6) - side(nn, 3)
    val docs = Seq((1L, "clean prose"), (2L, "spam zzz"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = QualityModel.scoreQuality(docs, counts)
      .as[(Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val q1 = w(2, 0) + w(2, 0)
    assert(out(1L) == ((2L, 0L, q1, q1 > 0)))
    val q2 = w(0, 2) + w(0, 0) // zzz is OOV
    assert(out(2L) == ((2L, 1L, q2, q2 > 0)))
    assert(out(3L) == ((0L, 0L, 0L, false)))
    // sanity on the signs: clean prose is positive, spam negative
    assert(q1 > 0 && q2 < 0)
  }

  test("updateCounts(b1, b2) equals tokenClassCounts(b1 union b2)") {
    val b1 = labeled
    val b2 = Seq((true, "prose again"), (false, "junk junk"))
      .toDF("label", "text")
    val inc = QualityModel.updateCounts(
      QualityModel.tokenClassCounts(b1), b2)
      .as[(String, Long, Long)].collect().toSet
    val full = QualityModel.tokenClassCounts(b1.unionByName(b2))
      .as[(String, Long, Long)].collect().toSet
    assert(inc == full)
  }

  test("broadcast path equals the join path bit-for-bit") {
    val counts = QualityModel.tokenClassCounts(labeled)
    val docs = Seq((1L, "clean prose"), (2L, "spam zzz junk"),
      (3L, "good spam"), (4L, ""), (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val viaJoin = QualityModel.scoreQuality(docs, counts)
      .as[(Long, Long, Long, Long, Boolean)].collect().toSet
    val model = QualityModel.collectClassifier(counts)
    val viaBc = QualityModel.scoreQualityBroadcast(docs, model)
      .as[(Long, Long, Long, Long, Boolean)].collect().toSet
    assert(viaJoin == viaBc)
  }

  test("minCount pruning drops pruned tokens to the OOV weight") {
    val counts = QualityModel.tokenClassCounts(labeled)
    val model = QualityModel.collectClassifier(counts, minCount = 2)
    // 'good' (1+0) and 'junk' (0+1) pruned; 'clean'/'prose'/'spam' kept
    assert(model.weights.keySet == Set("clean", "prose", "spam"))
    val out = QualityModel.scoreQualityBroadcast(
      Seq((1L, "good")).toDF("doc_id", "text"), model)
      .as[(Long, Long, Long, Long, Boolean)].collect().head
    assert(out._3 == 1L && out._4 == model.oovWeight)
  }

  test("empty count table fails loudly on both paths") {
    val empty = QualityModel.tokenClassCounts(
      Seq.empty[(Boolean, String)].toDF("label", "text"))
    val docs = Seq((1L, "a")).toDF("doc_id", "text")
    val e1 = intercept[Exception] {
      QualityModel.scoreQuality(docs, empty).collect()
    }
    assert(e1.getMessage.contains("vocab_v = 0") ||
      e1.getCause != null &&
        e1.getCause.getMessage.contains("vocab_v = 0"))
    val e2 = intercept[IllegalArgumentException] {
      QualityModel.collectClassifier(empty)
    }
    assert(e2.getMessage.contains("vocab_v = 0"))
  }
}
