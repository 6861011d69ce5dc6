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
}
