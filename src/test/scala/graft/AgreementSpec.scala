package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Agreement

/** Cohen's kappa hand-checks: the textbook 2×2 example, chance-level
  * and negative agreement, pairwise-complete abstention handling, and
  * the degenerate single-category NULL. */
class AgreementSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def labels(rows: (Long, String, String)*) = {
    import spark.implicits._
    rows.toDF("item", "judge", "label")
  }

  private def kappaRow(df: org.apache.spark.sql.DataFrame) = {
    val r = Agreement.cohenKappa(df).collect()
    assert(r.length === 1)
    r.head
  }

  test("textbook example: po 0.7, pe 0.5, kappa 0.4") {
    val aGood = Set(1L, 2L, 3L, 4L, 5L, 6L)
    val bGood = Set(1L, 2L, 3L, 4L, 7L)
    val rows = (1L to 10L).flatMap(i => Seq(
      (i, "a", if (aGood(i)) "good" else "bad"),
      (i, "b", if (bGood(i)) "good" else "bad")))
    val r = kappaRow(labels(rows: _*))
    assert(r.getAs[Long]("n") === 10L)
    assert(r.getAs[Long]("po_micro") === 700000L)
    assert(r.getAs[Long]("pe_micro") === 500000L)
    assert(r.getAs[Long]("kappa_micro") === 400000L)
  }

  test("perfect disagreement goes negative, same on both engines") {
    val r = kappaRow(labels(
      (1L, "a", "good"), (1L, "b", "bad"),
      (2L, "a", "bad"), (2L, "b", "good")))
    assert(r.getAs[Long]("po_micro") === 0L)
    assert(r.getAs[Long]("pe_micro") === 500000L)
    assert(r.getAs[Long]("kappa_micro") === -1000000L)
  }

  test("abstentions: only co-labeled items enter a pair") {
    // c labels only item 1; the (a,c) pair has n=1, the (a,b) pair n=2
    val out = Agreement.cohenKappa(labels(
      (1L, "a", "x"), (1L, "b", "x"), (1L, "c", "x"),
      (2L, "a", "y"), (2L, "b", "y"))).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n"))
      .toMap
    assert(out === Map(("a", "b") -> 2L, ("a", "c") -> 1L,
      ("b", "c") -> 1L))
  }

  test("single shared category yields NULL kappa, not a crash") {
    val r = kappaRow(labels(
      (1L, "a", "same"), (1L, "b", "same"),
      (2L, "a", "same"), (2L, "b", "same")))
    assert(r.getAs[Long]("po_micro") === 1000000L)
    assert(r.getAs[Long]("pe_micro") === 1000000L)
    assert(r.isNullAt(r.fieldIndex("kappa_micro")))
  }

  test("null labels and items drop before pairing") {
    val r = kappaRow(labels(
      (1L, "a", "x"), (1L, "b", "x"),
      (2L, "a", null), (2L, "b", "x")))
    assert(r.getAs[Long]("n") === 1L)
  }
}
