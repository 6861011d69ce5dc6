package graft

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HashedTf
import graft.llm.TextHash

/** The native hashed-TF expression's two hand-written paths —
  * interpreted nullSafeEval vs doGenCode (round-16 ADVICE: nothing
  * asserted they agree) — pinned equal on edge inputs, and both pinned
  * against the arithmetic contract (h32p bucket, sgn: parity sign). */
class HashedTfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dim = 16

  private def evalInterpreted(words: Seq[String]): Seq[Double] = {
    val e = HashedTf(org.apache.spark.sql.catalyst.expressions.Literal(null),
      dim)
    val in = new GenericArrayData(
      words.map(w => if (w == null) null else UTF8String.fromString(w))
        .toArray[Any])
    e.nullSafeEval(in).asInstanceOf[ArrayData]
      .toArray[Any](org.apache.spark.sql.types.DoubleType)
      .map(_.asInstanceOf[Double]).toSeq
  }

  test("interpreted eval == codegen on edge inputs") {
    val cases = Seq(
      Seq("alpha", "beta", "alpha"),       // repeats accumulate
      Seq.empty[String],                   // empty array -> zero vector
      Seq("alpha", null, "beta"),          // null element skipped
      Seq("éclair", "😀", "中文"), // non-ASCII/non-BMP
      Seq(""))                             // empty word still hashes
    val dir = java.nio.file.Files
      .createTempDirectory("graft-hashedtf-spec").toString
    cases.zipWithIndex.map { case (ws, i) => (i.toLong, ws) }
      .toDF("id", "ws").write.mode("overwrite").parquet(dir)
    // codegen path: parquet scan through whole-stage codegen
    val got = spark.read.parquet(dir)
      .select(col("id"),
        call_function("graft_hashed_tf", col("ws"), lit(dim)).as("v"))
      .orderBy("id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1))
      .toMap
    cases.zipWithIndex.foreach { case (ws, i) =>
      assert(got(i.toLong) == evalInterpreted(ws), s"case $i: $ws")
    }
  }

  test("both paths honor the h32p bucket + sgn: parity contract") {
    val w = "alpha"
    val b = (TextHash.h32pScala(w) % dim).toInt
    val s = if (TextHash.h32pScala(s"sgn:$w") % 2 == 0) 1.0 else -1.0
    val v = evalInterpreted(Seq(w, w))
    assert(v(b) == 2 * s)
    assert(v.zipWithIndex.filter(_._2 != b).forall(_._1 == 0.0))
  }

  test("null array -> null through both paths") {
    val r = Seq((1L, Option.empty[Seq[String]])).toDF("id", "ws")
      .select(call_function("graft_hashed_tf", col("ws"), lit(dim)))
      .collect().head
    assert(r.isNullAt(0))
  }
}
