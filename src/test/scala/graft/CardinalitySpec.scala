package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Cardinality

/** Register-sketch laws (duplicate insensitivity, merge identity,
  * idempotence), the integer estimator's constants, accuracy bounds at
  * both ends, and the streaming register chain. */
class CardinalitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs(rows: (Long, String, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "source", "text")
  }

  private def regMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[String]("source"),
      r.getAs[Long]("bucket")) -> r.getAs[Long]("reg")).toMap

  test("hardcoded constants match their closed forms") {
    assert(Cardinality.AlphaMicro ===
      math.round(0.7213 / (1 + 1.079 / Cardinality.M) * 1e6))
    assert(Cardinality.LcMicro.length === Cardinality.M - 1)
    assert(Cardinality.LcMicro(0) ===
      math.floor(Cardinality.M * math.log(Cardinality.M.toDouble) * 1e6).toLong)
    // the table is strictly decreasing in V and ends near zero
    assert(Cardinality.LcMicro.sliding(2).forall(p => p(0) > p(1)))
    assert(Cardinality.LcMicro.last ===
      math.floor(256.0 * math.log(256.0 / 255.0) * 1e6).toLong)
  }

  test("registers ignore duplicates; sharded merge equals single-pass; merge is idempotent") {
    val words = (1 to 400).map(i => s"w$i")
    val a = docs((1L, "s", words.take(200).mkString(" ")))
    val b = docs((2L, "s", words.drop(200).mkString(" ")),
      (3L, "s", words.take(50).mkString(" "))) // overlap with shard a
    val full = docs((4L, "s", (words ++ words).mkString(" ")))
    val single = regMap(Cardinality.wordSketch(full))
    val merged = regMap(Cardinality.mergeSketches(
      Cardinality.wordSketch(a), Cardinality.wordSketch(b), Seq("source")))
    assert(merged === single)
    val twice = regMap(Cardinality.mergeSketches(
      Cardinality.wordSketch(full), Cardinality.wordSketch(full), Seq("source")))
    assert(twice === single)
  }

  test("estimate: small range is exact via linear counting, large range within HLL bounds") {
    val few = docs((1L, "s", (1 to 10).map(i => s"tok$i").mkString(" ")))
    val estFew = Cardinality.estimate(Cardinality.wordSketch(few), Seq("source"))
      .collect().head.getAs[Long]("est")
    assert(math.abs(estFew - 10L) <= 1, s"LC estimate $estFew for 10 keys")
    val many = docs((1 to 20).map(d =>
      (d.toLong, "s", (1 to 150).map(i => s"k${d}_$i").mkString(" "))): _*)
    val estMany = Cardinality.estimate(Cardinality.wordSketch(many), Seq("source"))
      .collect().head.getAs[Long]("est")
    // 3000 distinct keys; 1.04/sqrt(256) ≈ 6.5 % σ — allow 3σ
    assert(math.abs(estMany - 3000.0) / 3000.0 < 0.20,
      s"estimate $estMany for 3000 keys")
  }

  test("groups estimate independently and null texts drop") {
    val d = docs((1L, "a", "x y z"), (2L, "b", "x"), (3L, "b", null))
    val est = Cardinality.estimate(Cardinality.wordSketch(d), Seq("source"))
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("est")).toMap
    assert(est === Map("a" -> 3L, "b" -> 1L))
  }

  test("streaming chain: folded batches equal single-pass; replay absorbs") {
    val stateDir = Files.createTempDirectory("graft-card").toString
    val words = (1 to 300).map(i => s"s$i")
    val batches = Seq(
      docs((1L, "a", words.take(100).mkString(" ")), (2L, "b", "b1 b2")),
      docs((3L, "a", words.slice(80, 200).mkString(" "))),
      docs((4L, "a", words.drop(200).mkString(" ")), (5L, "b", "b2 b3")))
    batches.zipWithIndex.foreach { case (b, i) =>
      graft.streaming.StreamingCardinality.foldBatch(b, i.toLong, stateDir)
    }
    val allDocs = batches.reduce(_ unionByName _)
    val want = regMap(Cardinality.wordSketch(allDocs))
    assert(regMap(graft.streaming.StreamingCardinality
      .latestRegisters(spark, stateDir).get) === want)
    // replay of the last batch recomputes from the predecessor — stable
    graft.streaming.StreamingCardinality.foldBatch(batches(2), 2L, stateDir)
    assert(regMap(graft.streaming.StreamingCardinality
      .latestRegisters(spark, stateDir).get) === want)
    val est = graft.streaming.StreamingCardinality
      .latestEstimate(spark, stateDir).get.collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("est")).toMap
    assert(est("b") === 3L) // LC-exact at tiny cardinality
    assert(math.abs(est("a") - 300.0) / 300.0 < 0.20)
  }
}
