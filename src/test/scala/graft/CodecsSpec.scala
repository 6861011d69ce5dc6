package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.codec.Codecs

/** Pure-codec properties mirroring the reference's unit tests
  * (monstache_test.go:108-302): float `_id` collapsing, NaN/Inf pruning,
  * version packing, Go-layout translation. Column codecs are evaluated
  * through Spark on ScalaCheck-generated batches so the tested artifact is
  * the actual Catalyst expression, not a Scala re-implementation. */
class CodecsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("tsVersion packs (T<<32|I)+offset and delete beats same-instant update") {
    val rows = Seq(
      (5L, 7L, "i"), (5L, 7L, "u"), (5L, 7L, "d"),
      (0L, 0L, "i"), (4294967295L, 4294967295L, "d"),
      (5L, 7L, "drop_coll"))
    val got = rows.toDF("t", "i", "op")
      .select(Codecs.tsVersion(col("t"), col("i"), col("op")).as("v"))
      .as[Long].collect().toSeq
    val want = rows.map { case (t, i, op) =>
      val off = op match { case "u" => 1L; case "d" => 2L; case _ => 0L }
      (t << 32 | i) + off
    }
    assert(got == want)
    // delete > update > insert at one cluster instant
    assert(want(2) > want(1) && want(1) > want(0))
  }

  test("numericIdToString collapses whole doubles (monstache_test.go TestOpIdToString)") {
    val vals = Gen.listOfN(300, Gen.chooseNum(-1e12, 1e12))
      .apply(Gen.Parameters.default, Seed(42L)).get ++
      Seq(10.0, 10.5, -3.0, 0.0, 0.5)
    val got = vals.toDF("v")
      .select(Codecs.numericIdToString(col("v")).as("s")).as[String].collect()
    vals.zip(got).foreach { case (v, s) =>
      if (v == math.floor(v) && !v.isNaN)
        assert(s == v.toLong.toString, s"whole $v should collapse")
      else assert(s == v.toString, s"fractional $v should not collapse")
    }
  }

  test("pruneInvalidDouble nulls NaN and ±Inf, passes everything else") {
    val vals = Seq(1.5, -2.0, 0.0, Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, Double.MaxValue, Double.MinPositiveValue)
    val got = vals.toDF("v")
      .select(Codecs.pruneInvalidDouble(col("v")).as("p"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    vals.zip(got).foreach { case (v, p) =>
      if (v.isNaN || v.isInfinite) assert(p.isEmpty, s"$v should prune")
      else assert(p.contains(v))
    }
  }

  test("goLayoutToJvm translates reference layouts exactly") {
    assert(Codecs.goLayoutToJvm("2006/01/02 15:04:05") == "yyyy/MM/dd HH:mm:ss")
    assert(Codecs.goLayoutToJvm("2006-01-02") == "yyyy-MM-dd")
    assert(Codecs.goLayoutToJvm("2006-01-02T15:04:05.000Z07:00") ==
      "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
    // micro/nano tokens must win over the milli prefix (longest-first)
    assert(Codecs.goLayoutToJvm("15:04:05.000000") == "HH:mm:ss.SSSSSS")
    assert(Codecs.goLayoutToJvm("15:04:05.000000000") == "HH:mm:ss.SSSSSSSSS")
    // stray letters are quoted so they can't be pattern chars
    assert(Codecs.goLayoutToJvm("x2006") == "'x'yyyy")
  }

  test("idAccepted rejects empty and >512-byte ids (monstache.go:3167-3171)") {
    val ids = Seq("a", "", null, "x" * 512, "x" * 513, "é" * 256, "é" * 257)
    val got = ids.toDF("id")
      .select(coalesce(Codecs.idAccepted(col("id")), lit(false)).as("ok"))
      .as[Boolean].collect().toSeq
    // "é" is 2 bytes UTF-8: 256 é = 512 bytes ok, 257 é = 514 bytes rejected
    assert(got == Seq(true, false, false, true, false, true, false))
  }
}
