package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{Masking, TextHash}

/** Span-corruption plan properties: hash-derived offsets, window
  * disjointness, the ragged-tail rule, and bit-reproducibility. */
class MaskingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("offsets match the hash family by hand; spans sit in-window") {
    val text = (1 to 45).map(i => s"w$i").mkString(" ") // 2 full windows
    val plan = Masking.withMaskPlan(docs(7L -> text)).collect()
      .map(r => r.getAs[Long]("span_idx") ->
        (r.getAs[Long]("start_tok"), r.getAs[String]("masked")))
      .toMap
    assert(plan.keySet === Set(0L, 1L)) // 45 tokens -> windows 0,1; tail drops
    for (w <- Seq(0L, 1L)) {
      val off = TextHash.h32pScala(s"7:$w") % 18
      val start = w * 20 + off + 1
      assert(plan(w)._1 === start)
      assert(plan(w)._2 ===
        (start until start + 3).map(i => s"w$i").mkString(" "))
    }
  }

  test("docs shorter than one window emit no spans") {
    assert(Masking.withMaskPlan(
      docs(1L -> "only five words right here")).count() === 0L)
    assert(Masking.withMaskPlan(docs(2L -> null)).count() === 0L)
  }

  test("spans never cross windows and never overlap") {
    val text = (1 to 200).map(i => s"t$i").mkString(" ")
    val rows = Masking.withMaskPlan(docs(3L -> text)).collect()
      .map(r => (r.getAs[Long]("span_idx"), r.getAs[Long]("start_tok"),
        r.getAs[Long]("len")))
    assert(rows.length === 10)
    rows.foreach { case (w, start, len) =>
      assert(start >= w * 20 + 1 && start + len - 1 <= (w + 1) * 20,
        s"window $w span [$start, ${start + len - 1}] leaks")
    }
    val covered = rows.flatMap { case (_, s0, l) => s0 until s0 + l }
    assert(covered.distinct.length === covered.length, "overlap")
    // the advertised rate: 3 of every 20 full-window tokens
    assert(covered.length * 20 === 200 * 3)
  }

  test("the plan is a pure function of (doc_id, text)") {
    val text = (1 to 40).map(i => s"x$i").mkString(" ")
    def run() = Masking.withMaskPlan(docs(9L -> text))
      .orderBy("span_idx").collect().map(_.toSeq).toSeq
    assert(run() === run())
    // the doc_id salt is load-bearing: doc 10's offsets equal ITS hash
    // family values, not doc 9's
    val other = Masking.withMaskPlan(docs(10L -> text))
      .orderBy("span_idx").collect()
      .map(r => r.getAs[Long]("span_idx") -> r.getAs[Long]("start_tok"))
      .toMap
    for (w <- Seq(0L, 1L))
      assert(other(w) === w * 20 + TextHash.h32pScala(s"10:$w") % 18 + 1)
  }
}
