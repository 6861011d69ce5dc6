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

  test("goDurationToMillis parses the reference's duration forms loudly") {
    assert(Codecs.goDurationToMillis("30s") == 30000L)
    assert(Codecs.goDurationToMillis("1.5h") == 5400000L)
    assert(Codecs.goDurationToMillis("2h45m") == 9900000L)
    assert(Codecs.goDurationToMillis("300ms") == 300L)
    // unit-less, unknown-unit, and trailing-garbage forms must all be
    // loud — a silently-zero stats cadence flushes nothing, forever
    intercept[IllegalArgumentException](Codecs.goDurationToMillis("10"))
    intercept[IllegalArgumentException](Codecs.goDurationToMillis("5d"))
    intercept[IllegalArgumentException](Codecs.goDurationToMillis("1h30"))
    // a sub-millisecond duration truncates to 0 — the same silent
    // flush-nothing cadence, so it must be loud too (a true "0s" is an
    // explicit zero, allowed: callers treat it as disabled)
    intercept[IllegalArgumentException](Codecs.goDurationToMillis("0.5ms"))
    assert(Codecs.goDurationToMillis("0s") == 0L)
    // sub-ms REMAINDERS truncate fine when the total stays nonzero
    assert(Codecs.goDurationToMillis("1s0.5ms") == 1000L)
  }

  test("goLayoutToJvm rejects Go tokens outside the supported subset") {
    // supported layouts translate
    assert(Codecs.goLayoutToJvm("2006-01-02") == "yyyy-MM-dd")
    assert(Codecs.goLayoutToJvm("monstache.stats.2006-01-02")
      == "'monstache'.'stats'.yyyy-MM-dd")
    // a dot followed by a 0-run that continues with digits is a literal
    // dot + the month token, exactly Go's own fraction rule
    assert(Codecs.goLayoutToJvm("2006.01") == "yyyy.MM")
    // Go SUBSTITUTES these ("January" renders the month, "06" the
    // two-digit year, "3" the 12h hour) — passing them through as
    // literals would stamp silently wrong index names, so they are loud
    intercept[IllegalArgumentException](
      Codecs.goLayoutToJvm("monstache.stats.January-06"))
    intercept[IllegalArgumentException](Codecs.goLayoutToJvm("06-01-02"))
    intercept[IllegalArgumentException](Codecs.goLayoutToJvm("3:04PM"))
    intercept[IllegalArgumentException](Codecs.goLayoutToJvm("Monday 01"))
    intercept[IllegalArgumentException](Codecs.goLayoutToJvm("02 15:04:05.999"))
    // digits Go treats as LITERALS ('0' not before 1-6, and 6-9) pass
    // through verbatim, like the reference renders them
    assert(Codecs.goLayoutToJvm("v7.2006-01-02") == "'v'7.yyyy-MM-dd")
    assert(Codecs.goLayoutToJvm("2006-01-02T00") == "yyyy-MM-dd'T'00")
  }

  test("string ids pass verbatim — only float-form values collapse (opIDToString default branch)") {
    // the reference collapses float64/float32-TYPED ids only; string ids
    // — including exotic-but-valid forms like "1e5" — print verbatim
    val ids = Seq("1e5", "1E5", "0x10", "abc", "42", "007", "-13", "10.5", "")
    val got = ids.toDF("v")
      .select(Codecs.numericIdToString(col("v")).as("s")).as[String].collect().toSeq
    assert(got == ids)
    // fraction-marked whole values are the one case indistinguishable
    // from a stringified double-typed id, and collapse (both plain and
    // scientific double renderings)
    val whole = Seq("10.0", "1.0E3").toDF("v")
      .select(Codecs.numericIdToString(col("v")).as("s")).as[String].collect().toSeq
    assert(whole == Seq("10", "1000"))
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

  test("BSON binary codecs: ObjectID hex, UUID, base64 (encoding.go:58-80)") {
    val hexes = Seq("0123456789abcdef01234567")
    val got = hexes.toDF("h").select(
      Codecs.objectIdHex(unhex(col("h"))).as("oid"),
      Codecs.binaryToUuid(unhex(concat(col("h"), lit("89abcdef")))).as("uuid"),
      Codecs.binaryToBase64(unhex(substring(col("h"), 1, 16))).as("b64"))
      .collect().head
    assert(got.getString(0) == "0123456789abcdef01234567")
    assert(got.getString(1) == "01234567-89ab-cdef-0123-456789abcdef")
    // 8 bytes 0123456789abcdef → base64
    assert(got.getString(2) ==
      java.util.Base64.getEncoder.encodeToString(
        Array(0x01, 0x23, 0x45, 0x67, 0x89, 0xab, 0xcd, 0xef).map(_.toByte)))
    // non-16-byte payloads fall back to plain hex (encoding.go default branch)
    val fallback = Seq("0badf00d").toDF("h")
      .select(Codecs.binaryToUuid(unhex(col("h"))).as("u"))
      .as[String].collect().head
    assert(fallback == "0badf00d")
  }

  test("decimal128Json: raw literal at source scale, NaN/Inf → null (encoding.go:47-56)") {
    val got = Seq(1.5, Double.NaN, Double.PositiveInfinity, -2.25)
      .toDF("v").select(Codecs.decimal128Json(col("v")).as("s"))
      .collect().map(r => Option(r.getString(0)))
    // the source value's own scale, not a fixed-scale recast ("1.500000")
    assert(got(0).contains("1.5"))
    assert(got(1).isEmpty && got(2).isEmpty)
    assert(got(3).contains("-2.25"))
    // a decimal source keeps its declared scale and survives > 6 dp
    val dec = Seq("1.23456789", "42.10")
      .toDF("s").select(Codecs.decimal128Json(col("s").cast("decimal(20,8)")).as("j"))
      .as[String].collect().toSeq
    assert(dec == Seq("1.23456789", "42.10000000"))
  }

  test("bsonDateString: ISO millis UTC; years outside [0,9999] → null") {
    val got = Seq(1750000000000000L, 300000000000000000L)
      .toDF("us").select(Codecs.bsonDateString(timestamp_micros(col("us"))).as("d"))
      .collect().map(r => Option(r.getString(0)))
    assert(got(0).contains("2025-06-15T15:06:40.000Z"))
    assert(got(1).isEmpty) // year 11476
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
