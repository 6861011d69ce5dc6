package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.HeavyHitters

/** Misra–Gries summary algebra: capacity, the one-sided underestimate,
  * the `c(x) > err` survival guarantee, merge-order robustness, and the
  * deterministic boundary-tie behavior (including the all-counters-die
  * edge both engines must agree on). */
class HeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def keyed(rows: (String, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("grp", "k")
  }

  /** grp→term→n of a summary frame. */
  private def counters(df: DataFrame): Map[(String, String), Long] =
    df.collect().map(r => (r.getAs[String]("grp"),
      r.getAs[String]("term")) -> r.getAs[Long]("n")).toMap

  private def errOf(df: DataFrame, grp: String): Long = {
    val es = df.filter(col("grp") === grp).select("err")
      .distinct().collect().map(_.getLong(0))
    assert(es.length <= 1, s"err must be constant per group: ${es.toSeq}")
    es.headOption.getOrElse(0L)
  }

  private def zipf(grp: String, spec: (String, Int)*): Seq[(String, String)] =
    spec.flatMap { case (t, n) => Seq.fill(n)(grp -> t) }

  test("summarize keeps <= k counters and underestimates every count") {
    val rows = zipf("a", "x" -> 40, "y" -> 20, "z" -> 9, "w" -> 5,
      "v" -> 3, "u" -> 2, "t" -> 1)
    val s = HeavyHitters.summarize(keyed(rows: _*), col("k"),
      Seq("grp"), k = 3)
    val cs = counters(s)
    assert(cs.size <= 3)
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // (k+1)-th largest is w=5: survivors are x,y,z minus 5
    assert(cs === Map(("a", "x") -> 35L, ("a", "y") -> 15L,
      ("a", "z") -> 4L))
    assert(errOf(s, "a") === 5L)
    // every key: n(x) <= c(x) <= n(x) + err
    exact.foreach { case ((g, t), c) =>
      val n = cs.getOrElse((g, t), 0L)
      assert(n <= c && c <= n + errOf(s, g), s"$t: n=$n c=$c")
    }
  }

  test("any key with exact > err survives a merge tree") {
    val all = zipf("a", "big" -> 60, "mid" -> 25) ++
      (1 to 30).flatMap(i => zipf("a", s"noise$i" -> 2))
    val shards = all.zipWithIndex.groupBy(_._2 % 3).toSeq.sortBy(_._1)
      .map { case (_, part) =>
        HeavyHitters.summarize(keyed(part.map(_._1): _*), col("k"),
          Seq("grp"), k = 4)
      }
    val root = HeavyHitters.merge(
      HeavyHitters.merge(shards(0), shards(1), Seq("grp"), 4),
      shards(2), Seq("grp"), 4)
    val err = errOf(root, "a")
    val cs = counters(root)
    val exact = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    exact.foreach { case ((g, t), c) =>
      val n = cs.getOrElse((g, t), 0L)
      assert(n <= c && c <= n + err, s"$t: n=$n c=$c err=$err")
      if (c > err) assert(cs.contains((g, t)), s"heavy $t (c=$c) missing")
    }
    assert(cs.contains(("a", "big")))
  }

  test("merge order changes counters but never breaks the bounds") {
    val all = zipf("a", "x" -> 30, "y" -> 12, "z" -> 8, "w" -> 8,
      "v" -> 7, "u" -> 6)
    val parts = all.zipWithIndex.groupBy(_._2 % 3).toSeq.sortBy(_._1)
      .map { case (_, p) =>
        HeavyHitters.summarize(keyed(p.map(_._1): _*), col("k"),
          Seq("grp"), k = 3)
      }
    val exact = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val orders = Seq(
      HeavyHitters.merge(HeavyHitters.merge(parts(0), parts(1),
        Seq("grp"), 3), parts(2), Seq("grp"), 3),
      HeavyHitters.merge(parts(0), HeavyHitters.merge(parts(1), parts(2),
        Seq("grp"), 3), Seq("grp"), 3))
    orders.foreach { root =>
      val err = errOf(root, "a")
      val cs = counters(root)
      exact.foreach { case ((g, t), c) =>
        val n = cs.getOrElse((g, t), 0L)
        assert(n <= c && c <= n + err, s"$t: n=$n c=$c err=$err")
      }
    }
  }

  test("uniform tie at the boundary can empty a group, deterministically") {
    // 4 keys, all count 5, k=3: sub = 5, every survivor hits n - sub = 0
    val s = HeavyHitters.summarize(
      keyed(zipf("a", "p" -> 5, "q" -> 5, "r" -> 5, "s" -> 5): _*),
      col("k"), Seq("grp"), k = 3)
    assert(s.count() === 0L)
  }

  test("groups compress independently") {
    val s = HeavyHitters.summarize(
      keyed(zipf("a", "x" -> 9, "y" -> 1) ++ zipf("b", "z" -> 4): _*),
      col("k"), Seq("grp"), k = 1)
    assert(counters(s) === Map(("a", "x") -> 8L, ("b", "z") -> 4L))
    assert(errOf(s, "a") === 1L)
    assert(errOf(s, "b") === 0L)
  }

  test("summary is reproducible (same input, same frame)") {
    val rows = zipf("a", "x" -> 7, "y" -> 7, "z" -> 3)
    def run() = HeavyHitters.summarize(keyed(rows: _*), col("k"),
      Seq("grp"), k = 2).orderBy("grp", "term")
      .collect().map(_.toSeq).toSeq
    assert(run() === run())
  }
}
