package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run (sessions are expensive;
  * suites must not stop it). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = GraftSession.ensure(GraftSession.configure(
      SparkSession.builder().master("local[2]").appName("graft-test"), "4"
    ).getOrCreate())
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
