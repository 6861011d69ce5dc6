package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{Cardinality, TextHash}

/** KMV bottom-k sketch: contents recomputed from first principles
  * (h32pScala over the same tokens), the merge/idempotence fold laws,
  * exact-below-k estimation, and the pairwise Jaccard matrix against
  * hand-counted set overlap. */
class KmvSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val docs: Seq[(Long, String, String)] = Seq(
    (1L, "a", "red green blue cyan"),
    (2L, "a", "red yellow green magenta"),
    (3L, "b", "red green blue white"),
    (4L, "b", "black white grey"),
    (5L, "c", "qqq www eee"))

  private def frame() = {
    import spark.implicits._
    docs.toDF("doc_id", "source", "text")
  }

  private def vocab(g: String): Set[String] =
    docs.filter(_._2 == g).flatMap(_._3.split(" ")).toSet

  private def bottomK(g: String, k: Int): Seq[Long] =
    vocab(g).map(TextHash.h32pScala).toSeq.sorted.take(k)

  test("sketch holds the k smallest distinct word hashes per group") {
    val k = 3
    val out = Cardinality.kmvWordSketch(frame(), k = k)
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).map { case (g, hs) => g -> hs.map(_._2).toSeq.sorted }
    for (g <- Seq("a", "b", "c"))
      assert(out(g) === bottomK(g, k), s"group $g")
  }

  test("merge of shard sketches equals the full sketch; self-merge is identity") {
    val k = 4
    val full = Cardinality.kmvWordSketch(frame(), k = k)
    val s0 = Cardinality.kmvWordSketch(frame().filter(col("doc_id") % 2 === 0), k = k)
    val s1 = Cardinality.kmvWordSketch(frame().filter(col("doc_id") % 2 === 1), k = k)
    val merged = Cardinality.mergeKmv(s0, s1, "source", k)
    assert(merged.collect().map(r => (r.getString(0), r.getLong(1))).sorted
      === full.collect().map(r => (r.getString(0), r.getLong(1))).sorted)
    val self = Cardinality.mergeKmv(full, full, "source", k)
    assert(self.collect().map(r => (r.getString(0), r.getLong(1))).sorted
      === full.collect().map(r => (r.getString(0), r.getLong(1))).sorted)
  }

  test("estimate is exact when the sketch held everything, KMV-form when full") {
    val k = 4
    val est = Cardinality.kmvEstimate(
        Cardinality.kmvWordSketch(frame(), k = k), "source", k)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // c has 3 distinct words < k ⇒ sketch complete ⇒ est exact
    assert(est("c") === ((3L, 3L)))
    // a has 6, b has 6 ⇒ sketches full at k=4 ⇒ (k−1)·P DIV h_(k)
    for (g <- Seq("a", "b")) {
      val hk = bottomK(g, k).last
      assert(est(g) === ((k.toLong, (k - 1).toLong * TextHash.P / hk)), s"group $g")
    }
  }

  test("pairwise matrix: union bottom-k, intersection count, exact when small") {
    val k = 16 // larger than any union here ⇒ every estimate is exact
    val out = Cardinality.kmvJaccardMatrix(
        Cardinality.kmvWordSketch(frame(), k = k), "source", k)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    def expect(ga: String, gb: String) = {
      val (va, vb) = (vocab(ga), vocab(gb))
      val union = (va ++ vb).size.toLong
      val inter = (va & vb).size.toLong
      (union, inter, inter * 1000000L / union, union)
    }
    assert(out(("a", "b")) === expect("a", "b")) // overlap: red green blue white?
    assert(out(("a", "c")) === expect("a", "c")) // disjoint ⇒ jacc 0
    assert(out(("b", "c")) === expect("b", "c"))
    assert(out(("a", "c"))._3 === 0L)
  }
}
