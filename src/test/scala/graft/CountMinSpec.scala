package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{CountMin, TextHash}

/** CMS cell algebra (hand-checked against the affine family), additive
  * merge, and the one-sided overestimate guarantee of point queries. */
class CountMinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs(rows: (Long, String, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "source", "text")
  }

  private def estMap(cms: org.apache.spark.sql.DataFrame,
                     terms: Seq[String]): Map[(String, String), Long] = {
    import spark.implicits._
    CountMin.estimates(cms, terms.toDF("term"), Seq("source"))
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("term")) ->
        r.getAs[Long]("est"))
      .toMap
  }

  test("census cells match the affine family by hand") {
    val cen = CountMin.wordCensus(docs((1L, "s", "alpha alpha beta")))
      .collect()
      .map(r => (r.getAs[Int]("r"), r.getAs[Long]("c")) -> r.getAs[Long]("n"))
      .toMap
    // D cells per distinct term (unless two rows collide), counts 2/1
    val expected = Seq("alpha" -> 2L, "beta" -> 1L).flatMap { case (t, n) =>
      val h = TextHash.h32pScala(t)
      (0 until CountMin.D).map(r =>
        (r, (TextHash.A(r) * h + TextHash.B(r)) % TextHash.P % CountMin.W) -> n)
    }
    val folded = expected.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(cen === folded)
  }

  test("merge is the additive sum; sharded build equals single-pass") {
    val all = docs(
      (0L, "s", "a b c a"), (1L, "s", "b d"), (2L, "t", "a a a"))
    val single = CountMin.wordCensus(all)
    val merged = CountMin.merge(
      CountMin.wordCensus(all.filter(col("doc_id") % 2 === 0)),
      CountMin.wordCensus(all.filter(col("doc_id") % 2 === 1)),
      Seq("source"))
    def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Int]("r"),
        r.getAs[Long]("c")) -> r.getAs[Long]("n")).toMap
    assert(toMap(single) === toMap(merged))
  }

  test("point estimates overestimate, never under; absent terms can hit zero") {
    val corpus = docs(
      (0L, "s", "x y z x y x"), (1L, "s", "w w y"), (2L, "t", "x q"))
    val cms = CountMin.wordCensus(corpus)
    val est = estMap(cms, Seq("x", "y", "w", "q", "zzz_never_seen"))
    val exact = Map(
      ("s", "x") -> 3L, ("s", "y") -> 3L, ("s", "w") -> 2L,
      ("s", "q") -> 0L, ("s", "zzz_never_seen") -> 0L,
      ("t", "x") -> 1L, ("t", "y") -> 0L, ("t", "w") -> 0L,
      ("t", "q") -> 1L, ("t", "zzz_never_seen") -> 0L)
    exact.foreach { case (k, ex) =>
      assert(est(k) >= ex, s"$k: est ${est(k)} < exact $ex")
    }
    // with 6 distinct terms in a 4×512 table, collisions are absent:
    // the estimates are exact here
    assert(est === exact)
  }

  test("state is config-bounded: at most D*W rows per group") {
    val many = docs((0L until 200L).map(i =>
      (i, "s", s"t$i u$i v$i")): _*)
    val n = CountMin.wordCensus(many).count()
    assert(n <= (CountMin.D * CountMin.W).toLong)
  }
}
