package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver's t1 smoke gate, pinned locally: the flagship DAG returns
  * rows on sf0.001 and carries the sink metadata columns. */
class EntrySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("entry returns rows with resolved sink metadata (driver smoke)") {
    val df = SparkEntry.entry(spark)
    val cols = df.columns.toSet
    assert(Set("meta_index", "meta_id", "meta_routing", "meta_version")
      .subsetOf(cols))
    assert(df.count() > 0)
  }
}
