package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The `spark.sql.extensions` entry point: a session built with
  * [[GraftExtensions]] resolves the native functions with no
  * `GraftSession.ensure` call — the path a spark-submit user on an
  * existing cluster takes. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("an extensions-built session resolves native functions unaided") {
    val prev = TestSpark.spark // keep the shared context alive
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[2]").appName("graft-ext")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(s ne prev, "builder must create a NEW session for the test")
      import s.implicits._
      val words = Seq("a b  c").toDF("t")
        .select(call_function("graft_words", col("t")))
        .as[Seq[String]].head()
      assert(words == Seq("a", "b", "c"))
      val dot = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("x", "y")
        .select(call_function("graft_dot", col("x"), col("y")))
        .as[Double].head()
      assert(dot == 11.0)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
      // the test session shares prev's SparkContext — do not stop it
    }
  }
}
