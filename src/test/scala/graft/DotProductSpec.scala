package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Similarity

/** The native DotProduct expression: value parity with the interpreted
  * SQL fold (the oracle's arithmetic), null behavior, and codegen
  * participation. */
class DotProductSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df = Seq(
    (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
    (Seq(0.1, 0.2), Seq(0.3, 0.4)),
    (Seq.empty[Double], Seq.empty[Double])
  ).toDF("a", "b")

  test("matches the interpreted aggregate(zip_with(...)) fold bit for bit") {
    val got = df.select(
        Similarity.dot(col("a"), col("b")).as("fast"),
        aggregate(zip_with(col("a"), col("b"), (p, q) => p * q),
          lit(0.0d), (acc, v) => acc + v).as("slow"))
      .as[(Double, Double)].collect()
    got.foreach { case (fast, slow) => assert(fast == slow) }
    assert(got.head._1 == 32.0)
  }

  test("null input yields null (BinaryExpression null-safety)") {
    val r = Seq((Seq(1.0), Option.empty[Seq[Double]])).toDF("a", "b")
      .select(Similarity.dot(col("a"), col("b")).as("d")).collect().head
    assert(r.isNullAt(0))
  }

  test("length mismatch yields null, never a plausible partial sum") {
    // interpreted path (local relation)
    val r1 = Seq((Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0))).toDF("a", "b")
      .select(Similarity.dot(col("a"), col("b")).as("d")).collect().head
    assert(r1.isNullAt(0))
    // codegen path (parquet-backed)
    val dir = java.nio.file.Files.createTempDirectory("graft-dot-mm").toString
    Seq((Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0)), (Seq(1.0, 2.0), Seq(3.0, 4.0)))
      .toDF("a", "b").write.mode("overwrite").parquet(dir)
    val rows = spark.read.parquet(dir)
      .select(Similarity.dot(col("a"), col("b")).as("d"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(rows.toSet == Set(None, Some(11.0)))
  }

  test("null ELEMENT yields null, never garbage-slot arithmetic") {
    // ArrayData.getDouble on a null slot reads unspecified memory — the
    // expression must null the whole product like the builtin
    // aggregate(zip_with(...)) form it replaces
    val ne = Seq((Seq[Option[Double]](Some(1.0), None, Some(2.0)),
      Seq[Option[Double]](Some(1.0), Some(1.0), Some(1.0)))).toDF("a", "b")
    val r = ne.select(Similarity.dot(col("a"), col("b")).as("d")).collect().head
    assert(r.isNullAt(0))
    // and through parquet (unsafe array data + whole-stage codegen)
    val dir = java.nio.file.Files.createTempDirectory("graft-dot-ne").toString
    ne.write.mode("overwrite").parquet(dir)
    val r2 = spark.read.parquet(dir)
      .select(Similarity.dot(col("a"), col("b")).as("d")).collect().head
    assert(r2.isNullAt(0))
  }

  test("wrong arity is a real error, not a dropped argument") {
    val e = intercept[Exception](
      spark.sql("SELECT graft_dot(array(1.0d), array(1.0d), array(1.0d))")
        .collect())
    assert(e.getMessage.contains("2 arguments"))
  }

  test("stays inside whole-stage codegen (no CodegenFallback)") {
    // a parquet-backed frame so the projection isn't constant-folded away
    val scan = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(array(col("value"), col("value") * 2).as("a"),
        array(col("value") * 3, col("value")).as("b"))
    val q = scan.select(Similarity.dot(col("a"), col("b")).as("d"))
    val plan = q.queryExecution.executedPlan.toString
    // the "*(n)" marker flags operators inside a WholeStageCodegen span;
    // a CodegenFallback expression would strip it from its Project
    assert(plan.linesIterator.exists(l =>
      l.contains("graft_dot") && l.trim.startsWith("*(")),
      s"graft_dot not inside a codegen span:\n$plan")
    // and it actually evaluates: 3v² + 2v²  = 5v²
    val row = q.agg(count(lit(1))).collect()
    assert(row.head.getLong(0) > 0)
  }
}
