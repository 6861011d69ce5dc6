package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Pii

/** Luhn-validated credit-card detection: checksum gating, all three
  * candidate shapes, the 17-digit-run exclusion, and literal redaction. */
class PiiCcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(texts: (Long, String)*): Map[Long, (Int, String)] = {
    import spark.implicits._
    Pii.withCreditCardRedaction(texts.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n_ccs"), r.getAs[String]("redacted_cc")))).toMap
  }

  test("valid cards redact in every shape; invalid checksums survive") {
    val out = run(
      1L -> "pay 4111111111111111 now",
      2L -> "pay 4111111111111112 now", // bad checksum
      3L -> "pay 4111-1111-1111-1111 now", // dashed, valid
      4L -> "pay 4222222222222 now", // 13-digit valid
      5L -> "serial 41111111111111112 stays") // 17 digits: no candidate
    assert(out(1L) === ((1, "pay <CC> now")))
    assert(out(2L) === ((0, "pay 4111111111111112 now")))
    assert(out(3L) === ((1, "pay <CC> now")))
    assert(out(4L) === ((1, "pay <CC> now")))
    assert(out(5L) === ((0, "serial 41111111111111112 stays")))
  }

  test("a matched card inside a longer digit run is NOT rewritten") {
    // the serial embeds the valid 13-digit card as a prefix; CcRe never
    // matched inside the run, so redaction must not touch it either —
    // a literal substring replace corrupted exactly this text
    val out = run(
      1L -> "card 4222222222222 ok serial 42222222222225678 stays")
    assert(out(1L)._1 === 1)
    assert(out(1L)._2 === "card <CC> ok serial 42222222222225678 stays")
  }

  test("a repeated valid card redacts at every site") {
    val out = run(1L -> "4111111111111111 and 4111111111111111")
    // the extract finds two candidates; the literal fold replaces both
    // occurrences at the first step and the second step is a no-op
    assert(out(1L)._1 === 2)
    assert(out(1L)._2 === "<CC> and <CC>")
  }

  test("luhnValid agrees with known vectors") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val out = Seq("4111111111111111", "4222222222222", "1234567812345678",
      "79927398713")
      .toDF("d").select(Pii.luhnValid(col("d"))).collect().map(_.getBoolean(0))
    assert(out.toSeq === Seq(true, true, false, true))
  }
}
