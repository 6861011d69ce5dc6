package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Dsir

/** DSIR importance scoring: target-resembling docs outscore
  * raw-typical ones, censuses merge additively, the OOV arm is the
  * target/raw total ratio, and wordless docs are inert. */
class DsirSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val raw = Seq(
    (1L, "code code code compile link"),
    (2L, "poem verse rhyme meter poem"),
    (3L, "code compile poem"),
    (4L, ""),
    (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
  private val target = Seq(
    (100L, "poem verse rhyme"),
    (101L, "verse meter poem")).toDF("doc_id", "text")

  private def scores = Dsir.withImportance(raw,
      Dsir.featureCensus(target), Dsir.featureCensus(raw))
    .collect()
    .map(r => r.getAs[Long]("doc_id") ->
      ((r.getAs[Long]("n_feats"), r.getAs[Long]("imp_micro")))).toMap

  test("target-resembling docs outscore raw-typical ones") {
    val s = scores
    // doc 2 is made of target words; doc 1 of words the target never
    // uses; doc 3 sits between. (Absolute sign is not asserted: at toy
    // scale the +B smoothing mass dominates both totals, so scores
    // center below zero — the RANKING is the operator's contract.)
    assert(s(2L)._2 > s(3L)._2)
    assert(s(3L)._2 > s(1L)._2)
    assert(s(1L)._1 === 5L && s(2L)._1 === 5L)
  }

  test("wordless docs score 0 over 0 features") {
    val s = scores
    assert(s(4L) === ((0L, 0L)))
    assert(s(5L) === ((0L, 0L)))
  }

  test("feature censuses merge additively") {
    val b1 = raw.filter(col("doc_id") <= 2L)
    val b2 = raw.filter(col("doc_id") > 2L)
    val merged = Dsir.mergeFeatureCensus(
        Dsir.featureCensus(b1), Dsir.featureCensus(b2))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = Dsir.featureCensus(raw)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged === full)
  }

  test("incremental scoring against merged censuses equals full-union") {
    val batch = Seq((10L, "poem code"), (11L, "")).toDF("doc_id", "text")
    val merged = Dsir.mergeFeatureCensus(
      Dsir.featureCensus(raw), Dsir.featureCensus(batch))
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_feats"), r.getAs[Long]("imp_micro")))).toMap
    val inc = canon(Dsir.withImportance(batch,
      Dsir.featureCensus(target), merged))
    val union = raw.unionByName(batch)
    val full = canon(Dsir.withImportance(union,
        Dsir.featureCensus(target), Dsir.featureCensus(union)))
      .view.filterKeys(_ >= 10L).toMap
    assert(inc === full)
    assert(inc(11L) === ((0L, 0L)))
  }

  test("a never-seen word takes the OOV (total-ratio) arm") {
    import org.apache.spark.sql.functions.lit
    val oovDoc = Seq((9L, "zzzzunseen")).toDF("doc_id", "text")
    val s = Dsir.withImportance(oovDoc, Dsir.featureCensus(target),
        Dsir.featureCensus(raw))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("imp_micro")).toMap
    // smoothed counts are 1 on both sides; only totals differ — raw has
    // more words than target, so the OOV arm is POSITIVE (rarer under
    // raw), exactly ln((R+B)/(T+B)) in floored micro-nats
    val t = 6L; val r = 13L; val b = Dsir.B
    val expected = math.floor(1e6 * math.log(1.0 / (t + b))).toLong -
      math.floor(1e6 * math.log(1.0 / (r + b))).toLong
    assert(s(9L) === expected)
  }
}
