package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.codec.PruneInvalidJson.prune

/** Recursive invalid-JSON pruning (P7, fixPruneInvalidJSON
  * monstache.go:878-950): NaN/Inf at any depth, date year range, arrays,
  * and canonical output. */
class PruneInvalidJsonSpec extends AnyFunSuite {

  test("prunes quoted non-finite literals at any nesting depth") {
    assert(prune("""{"a":"NaN","b":1}""") == """{"b":1}""")
    assert(prune("""{"o":{"x":"Infinity","y":2},"k":0}""")
      == """{"k":0,"o":{"y":2}}""")
    assert(prune("""{"o":{"i":{"d":"-Infinity"}}}""") == """{"o":{"i":{}}}""")
  }

  test("prunes non-finite numerics when the parser admits the literals") {
    assert(prune("""{"a":NaN,"b":1.5}""") == """{"b":1.5}""")
  }

  test("prunes array elements and recurses into survivors") {
    assert(prune("""{"xs":["NaN",1,{"y":"Infinity"}]}""")
      == """{"xs":[1,{}]}""")
  }

  test("date strings outside year [0,9999] are pruned, valid ones kept") {
    assert(prune("""{"t":"2025-06-15T12:00:00.000Z"}""")
      == """{"t":"2025-06-15T12:00:00.000Z"}""")
    assert(prune("""{"t":"11476-01-01T00:00:00.000Z"}""") == "{}")
    assert(prune("""{"t":"-0001-01-01T00:00:00.000Z"}""") == "{}")
    // a plain string that merely starts with digits is not a date
    assert(prune("""{"t":"12345 reasons"}""") == """{"t":"12345 reasons"}""")
  }

  test("null document passes through (deletes carry no body)") {
    assert(prune(null) == null)
  }
}

/** Rolling-hash fingerprint: incremental update ≡ direct polynomial,
  * short-doc fallback, window counts. */
class RollingFingerprintSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  import org.apache.spark.sql.functions.col
  import graft.llm.{TextAnalysis, TextHash}

  private def directMin(words: Seq[String]): Long = {
    def h(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % TextHash.P
    }
    val hs = words.map(h)
    val b = TextAnalysis.RollB
    if (hs.length < TextAnalysis.RollW)
      hs.foldLeft(0L)((acc, x) => (acc * b + x) % TextHash.P)
    else hs.sliding(TextAnalysis.RollW).map(
      _.foldLeft(0L)((acc, x) => (acc * b + x) % TextHash.P)).min
  }

  test("incremental rolling hash equals the direct window polynomial") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b c d e f g h i j k l m",
      "one two three", // shorter than the window
      "solo")
    val got = texts.toDF("text")
      .select(col("text"))
      .transform(df => TextAnalysis.withRollingFingerprint(df))
      .select("text", "fp_roll", "n_windows")
      .as[(String, Long, Long)].collect()
      .map { case (t, f, n) => t -> ((f, n)) }.toMap
    texts.foreach { t =>
      val ws = t.split(" ").toSeq
      val expWindows = if (ws.length < TextAnalysis.RollW) 1L
        else (ws.length - TextAnalysis.RollW + 1).toLong
      assert(got(t) == ((directMin(ws), expWindows)), s"mismatch for: $t")
    }
  }
}
