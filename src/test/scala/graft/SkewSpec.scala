package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

/** Salted-join correctness: identical rows to the plain join, with the
  * hot key actually spread across salt partitions (the property that
  * breaks the single-reducer bottleneck). */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("salted join equals the plain join on a skewed key") {
    import spark.implicits._
    // 90% of the fact side hits key 1 — the hot-namespace shape
    val facts = (1 to 2000).map(i =>
      (i.toLong, if (i % 10 == 0) (i % 5).toLong + 2 else 1L))
      .toDF("row_id", "k")
    val dim = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (4L, "c"), (5L, "d"), (6L, "e"))
      .toDF("dk", "label")
    val plain = facts.join(dim, col("k") === col("dk"))
      .select("row_id", "k", "label")
      .as[(Long, Long, String)].collect().toSet
    val salted = Skew.saltedJoin(facts, dim, "k", "dk", "row_id", salts = 8)
      .select("row_id", "k", "label")
      .as[(Long, Long, String)].collect().toSet
    assert(salted == plain && plain.size == 2000)
  }

  test("the hot key's rows spread across many salt values") {
    import spark.implicits._
    val facts = (1 to 1000).map(i => (i.toLong, 1L)).toDF("row_id", "k")
    val spreadOut = facts
      .withColumn("__salt", pmod(hash(col("row_id")), lit(8)))
      .select("__salt").distinct().count()
    assert(spreadOut == 8)
  }
}
