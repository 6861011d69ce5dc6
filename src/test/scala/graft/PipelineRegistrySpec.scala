package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PipelineRegistry

/** A1 pipeline registry semantics: global-then-namespace stage order and
  * the changeEvent flag splitting stream vs direct-read pipelines
  * (buildPipe, monstache.go:4336-4386). */
class PipelineRegistrySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val reg = PipelineRegistry(Map(
    "" -> ((_, _) => Seq(df => df.withColumn("trace", concat(col("trace"), lit("g"))))),
    "app.x" -> ((_, ce) =>
      if (ce) Seq(df => df.withColumn("trace", concat(col("trace"), lit("s"))))
      else Seq(df => df.withColumn("trace", concat(col("trace"), lit("d")))))))

  private def base = Seq(1).toDF("v").withColumn("trace", lit(""))

  test("global stages run before namespace stages (chain order, 4343)") {
    val got = reg(base, "app.x", changeEvent = true)
      .select("trace").as[String].head()
    assert(got == "gs")
  }

  test("changeEvent flag selects stream vs direct-read stages (4357-4377)") {
    val direct = reg(base, "app.x", changeEvent = false)
      .select("trace").as[String].head()
    assert(direct == "gd")
  }

  test("unregistered namespace gets only the global chain") {
    val got = reg(base, "app.other", changeEvent = true)
      .select("trace").as[String].head()
    assert(got == "g")
  }
}
