package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{Scored, TopBuf, TopKNeighbors}

/** The bounded-heap top-k [[TopKNeighbors]] must be partition-invariant:
  * however Spark splits the input across tasks and merges the partial
  * buffers, the result must equal the global sort's first k — otherwise
  * the map-side collapse the operator exists for would change answers
  * with the physical plan. Ties compare on raw doubles with id-ascending
  * order, mirroring the oracle's `ORDER BY cos DESC, id ASC`. */
class TopKNeighborsSpec extends AnyFunSuite {

  private def globalTopK(xs: Seq[Scored], k: Int): Seq[Scored] =
    xs.sortWith((a, b) =>
      a.cos > b.cos || (a.cos == b.cos && a.neighbor_id < b.neighbor_id))
      .take(k)

  private def viaAggregator(xs: Seq[Scored], k: Int,
                            splits: Seq[Int]): Seq[Scored] = {
    val agg = new TopKNeighbors(k)
    // cut xs at the given points → partitions; reduce each, merge all
    val cuts = (0 +: splits.sorted :+ xs.length).distinct.sorted
    val parts = cuts.zip(cuts.tail).map { case (a, b) => xs.slice(a, b) }
    parts.map(_.foldLeft(agg.zero)(agg.reduce))
      .foldLeft(agg.zero)(agg.merge).items
  }

  test("property: any partitioning + merge equals the global sort take k") {
    val gen = for {
      n <- Gen.chooseNum(0, 60)
      // duplicate cos values on purpose: a tiny value pool forces ties
      xs <- Gen.listOfN(n, for {
        id <- Gen.chooseNum(0L, 30L)
        cos <- Gen.oneOf(0.0, 0.25, 0.5, 0.5, 0.75, 1.0, -0.5)
      } yield Scored(id, cos, id % 4))
      k <- Gen.chooseNum(1, 8)
      nSplits <- Gen.chooseNum(0, 6)
      splits <- Gen.listOfN(nSplits, Gen.chooseNum(0, math.max(0, n)))
    } yield (xs, k, splits)
    val cases = Gen.listOfN(400, gen)
      .apply(Gen.Parameters.default, Seed(11L)).get
    cases.foreach { case (xs, k, splits) =>
      assert(viaAggregator(xs, k, splits) == globalTopK(xs, k),
        s"mismatch for k=$k splits=$splits xs=$xs")
    }
  }

  test("merge handles empty buffers and buffers shorter than k") {
    val agg = new TopKNeighbors(3)
    assert(agg.merge(agg.zero, agg.zero).items.isEmpty)
    val one = agg.reduce(agg.zero, Scored(1L, 0.9, 0L))
    assert(agg.merge(agg.zero, one).items == one.items)
    assert(agg.merge(one, agg.zero).items == one.items)
    assert(agg.finish(one) == TopBuf(one.items))
  }
}
