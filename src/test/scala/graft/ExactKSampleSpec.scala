package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{Sampling, TextHash}

/** Exact-k per-stratum sampling: exact counts, window-order agreement,
  * partitioning stability, and the NULL-stratum exclusion. */
class ExactKSampleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs = {
    import spark.implicits._
    (0L until 30L).map(i => (i, s"s${i % 3}")).toDF("doc_id", "source")
  }

  test("exactly min(k, n) rows survive per stratum") {
    val by3 = Sampling.exactKPerStratum(docs, 4, "source")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(by3 === Map("s0" -> 4L, "s1" -> 4L, "s2" -> 4L))
    assert(Sampling.exactKPerStratum(docs, 100, "source").count() === 30L)
  }

  test("the bounded heap elects the same ids as the row_number window") {
    val viaHeap = Sampling.exactKPerStratum(docs, 5, "source")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val h = TextHash.h32p(concat(lit(Sampling.TopKSalt),
      col("doc_id").cast("string")))
    val viaWindow = docs
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("source")
          .orderBy(h.asc, col("doc_id").asc)))
      .filter(col("rk") <= 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaHeap === viaWindow)
  }

  test("membership is stable under repartitioning") {
    val a = Sampling.exactKPerStratum(docs, 3, "source")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.exactKPerStratum(docs.repartition(7), 3, "source")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a === b)
  }

  test("string ids sample exactly — no long cast to NULL or collide them") {
    import spark.implicits._
    // non-numeric ids, plus decimal ids that a cast("long") would have
    // truncated onto each other ("7.1" and "7.9" → 7) — membership must
    // key on the string form end to end
    val sdocs = (Seq("alpha", "beta", "gamma", "delta") ++
      Seq("7.1", "7.9", "8.5"))
      .zipWithIndex.map { case (id, i) => (id, s"s${i % 2}") }
      .toDF("doc_id", "source")
    val kept = Sampling.exactKPerStratum(sdocs, 2, "doc_id",
      idCol = "doc_id")
    assert(kept.count() === 7L) // each id is its own stratum → all kept
    val by2 = Sampling.exactKPerStratum(sdocs, 2, "source")
    assert(by2.count() === 4L)  // exactly 2 per stratum, none NULLed away
    assert(by2.select("doc_id").distinct().count() === 4L)
  }

  test("NULL strata are excluded; k < 1 fails fast") {
    import spark.implicits._
    val withNull = docs.unionByName(
      Seq((99L, null.asInstanceOf[String])).toDF("doc_id", "source"))
    val kept = Sampling.exactKPerStratum(withNull, 100, "source")
    assert(kept.filter(col("doc_id") === 99L).count() === 0L)
    intercept[IllegalArgumentException] {
      Sampling.exactKPerStratum(docs, 0, "source")
    }
  }

  test("hash ties order by UTF-8 bytes, not UTF-16 units (non-BMP ids)") {
    import graft.llm.{KeepCand, KeepKSmallest}
    // U+FFFD (�, 3 UTF-8 bytes EF BF BD) vs U+1F600 (😀, surrogate
    // pair 😀, 4 bytes F0 9F 98 80): Java's UTF-16 compareTo
    // says � > \uD83D (0xFFFD > 0xD83D), the WRONG order — UTF-8
    // bytes (DuckDB's binary VARCHAR collation) say U+FFFD < U+1F600.
    // On an exact hash tie the smaller id wins the k=1 slot, so a
    // UTF-16 comparator elects the emoji and diverges from the oracle.
    val repl = "�"
    val emoji = "😀"
    assert(repl.compareTo(emoji) > 0)     // the UTF-16 trap is real
    val agg = new KeepKSmallest(1)
    val cands = Seq(KeepCand("s", 5L, emoji), KeepCand("s", 5L, repl))
    // reduce order must not matter, nor must merge vs reduce
    for (cs <- cands.permutations) {
      val reduced = cs.foldLeft(agg.zero)(agg.reduce)
      assert(agg.finish(reduced).items.map(_.id) == Seq(repl))
      val merged = agg.merge(
        agg.reduce(agg.zero, cs.head),
        agg.reduce(agg.zero, cs.last))
      assert(agg.finish(merged).items.map(_.id) == Seq(repl))
    }
    // property vs the model on a mixed ASCII / BMP / non-BMP pool with
    // deliberate hash collisions: the heap's kept set equals sort-by
    // (h, UTF-8 bytes) take k
    val ids = Seq("a", "Z", "é", repl, emoji, "😁", "zz")
    val pool = ids.zipWithIndex.map { case (id, i) =>
      KeepCand("s", (i % 3).toLong, id)  // 3-way hash collisions
    }
    def utf8Key(s: String): Seq[Int] =
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8).toSeq.map(_ & 0xff)
    import scala.math.Ordering.Implicits._
    val model = pool.sortBy(c => (c.h, utf8Key(c.id))).take(4).map(_.id)
    val k4 = new KeepKSmallest(4)
    val heap = k4.finish(pool.foldLeft(k4.zero)(k4.reduce))
    assert(heap.items.map(_.id) == model)
  }
}
