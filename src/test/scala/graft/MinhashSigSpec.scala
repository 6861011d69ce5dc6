package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.TextHash

/** The native MinhashSig expression: value parity with the interpreted
  * K × array_min(transform(...)) form (the oracle's arithmetic), the
  * empty/null contracts, and both eval paths (local = interpreted,
  * parquet = whole-stage codegen). */
class MinhashSigSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The builtin higher-order form — K walks, interpreted, but the
    * arithmetic ground truth. */
  private def slowSig(hs: org.apache.spark.sql.Column) =
    array((0 until TextHash.K).map { j =>
      array_min(transform(hs,
        h => (lit(TextHash.A(j)) * h + lit(TextHash.B(j))) % TextHash.P))
    }: _*)

  test("matches the interpreted per-coefficient array_min fold exactly") {
    val df = Seq(
      Tuple1(Seq(17L, 9999999L, 42L, 0L)),
      Tuple1(Seq(2147483646L)),
      Tuple1(Seq.empty[Long]))
      .toDF("hs")
    val got = df.select(TextHash.minhashSig(col("hs")).as("fast"),
        slowSig(col("hs")).as("slow"))
      .as[(Seq[Option[Long]], Seq[Option[Long]])].collect()
    got.foreach { case (fast, slow) => assert(fast == slow) }
    // empty input → K nulls, the array_min-of-empty shape
    assert(got.last._1 == Seq.fill(TextHash.K)(None))
  }

  test("codegen path (parquet) equals the interpreted path (local), row for row") {
    // keyed by id: a set compare would mask the codegen path swapping or
    // duplicating rows — the exact bug class this parity test exists for
    val rows = Seq(
      (1L, Seq(5L, 123456789L, 17L)),
      (2L, Seq(42L)),
      (3L, Seq.empty[Long]))
    def byId(df: org.apache.spark.sql.DataFrame) = df
      .select(col("id"), TextHash.minhashSig(col("hs")).as("sig"))
      .as[(Long, Seq[Option[Long]])].collect().toMap
    val local = byId(rows.toDF("id", "hs"))
    val dir = java.nio.file.Files.createTempDirectory("graft-mh").toString
    rows.toDF("id", "hs").write.mode("overwrite").parquet(dir)
    val codegen = byId(spark.read.parquet(dir))
    assert(local == codegen && local.size == 3)
  }

  test("simhash: native expression matches the SQL-twin vote rule on both paths") {
    import graft.functions.GraftFunctions
    def sim(c: org.apache.spark.sql.Column) =
      call_function(GraftFunctions.SimhashName, c)
    // ground truth via the documented vote rule, computed in Scala
    def slow(hs: Seq[Long]): Long = (0 until 32).foldLeft(0L) { (fp, b) =>
      if (2 * hs.count(h => ((h >> b) & 1L) == 1L) >= hs.length) fp | (1L << b)
      else fp
    }
    val rows = Seq(
      (1L, Seq(0xF0F0L, 0x0F0FL, 0xFFFFL)),
      (2L, Seq(7L)),
      (3L, Seq.empty[Long]))   // empty: every 2·0 ≥ 0 vote passes → all bits
    def byId(df: org.apache.spark.sql.DataFrame) = df
      .select(col("id"), sim(col("hs")).as("fp"))
      .as[(Long, Long)].collect().toMap
    val local = byId(rows.toDF("id", "hs"))
    assert(local == rows.map { case (id, hs) => id -> slow(hs) }.toMap)
    assert(local(3L) == 0xFFFFFFFFL)
    val dir = java.nio.file.Files.createTempDirectory("graft-sh").toString
    rows.toDF("id", "hs").write.mode("overwrite").parquet(dir)
    // keyed compare: set/sorted compares would mask row swaps in codegen
    assert(byId(spark.read.parquet(dir)) == local)
    // null element → null fingerprint
    val r = Seq(Tuple1(Seq[Option[Long]](Some(5L), None))).toDF("hs")
      .select(sim(col("hs"))).collect().head
    assert(r.isNullAt(0))
  }

  test("hashed shingles: native expression matches the HOF h32p form on both paths") {
    // ground truth: the interpreted transform over the hex-conv h32p
    def slow(c: org.apache.spark.sql.Column) =
      transform(c, s => TextHash.h32p(s))
    val rows = Seq(
      (1L, Seq("a b c", "b c d", "")),
      (2L, Seq("ünïcode tökens", "汉字 漢字")),
      (3L, Seq.empty[String]))
    def byId(df: org.apache.spark.sql.DataFrame) = df
      .select(col("id"), TextHash.hashedShingles(col("sh")).as("fast"),
        slow(col("sh")).as("slow"))
      .as[(Long, Seq[Option[Long]], Seq[Option[Long]])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val local = byId(rows.toDF("id", "sh"))
    local.values.foreach { case (fast, sl) => assert(fast == sl) }
    assert(local(3L)._1 == Seq.empty)
    val dir = java.nio.file.Files.createTempDirectory("graft-hs").toString
    rows.toDF("id", "sh").write.mode("overwrite").parquet(dir)
    // keyed compare against the local path: catches codegen row swaps
    assert(byId(spark.read.parquet(dir)) == local)
    // null array → null; null element → null element (the MinhashSig
    // null-propagation contract depends on element nulls surviving)
    val r = Seq((1L, Some(Seq(Some("x"), None))), (2L, None))
      .toDF("id", "sh")
      .select(col("id"), TextHash.hashedShingles(col("sh")).as("hs"))
      .as[(Long, Option[Seq[Option[Long]]])].collect().toMap
    assert(r(2L).isEmpty)
    assert(r(1L).get(0).nonEmpty && r(1L).get(1).isEmpty)
  }

  test("shingles: native expression matches the HOF slice/concat form on both paths") {
    // ground truth: the interpreted windowed form the native expression
    // replaced (including array_distinct's keep-first order)
    def slow(ws: org.apache.spark.sql.Column, n: Int) =
      array_distinct(
        when(size(ws) >= n,
          transform(sequence(lit(0), size(ws) - n),
            i => concat_ws(" ", slice(ws, i + 1, lit(n)))))
          .otherwise(array(concat_ws(" ", ws))))
    val rows = Seq(
      (1L, "a b c d e"),
      (2L, "a b a b a b"),   // duplicate windows → dedupe order matters
      (3L, "a b"),           // shorter than n → whole text
      (4L, ""),              // no words → [""] via the otherwise branch
      (5L, "x y z"))         // exactly n → one window
    def byId(df: org.apache.spark.sql.DataFrame) = df
      .select(col("id"),
        TextHash.shingles(TextHash.words(col("text")), 3).as("fast"),
        slow(TextHash.words(col("text")), 3).as("slow"))
      .as[(Long, Seq[String], Seq[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val local = byId(rows.toDF("id", "text"))
    local.foreach { case (id, (fast, sl)) => assert(fast == sl, s"id $id") }
    assert(local(2L)._1 == Seq("a b a", "b a b"))
    assert(local(4L)._1 == Seq(""))
    val dir = java.nio.file.Files.createTempDirectory("graft-ws").toString
    rows.toDF("id", "text").write.mode("overwrite").parquet(dir)
    assert(byId(spark.read.parquet(dir)).view.mapValues(_._1).toMap ==
      local.view.mapValues(_._1).toMap)
  }

  test("a null signature yields null band keys, never shared '' buckets") {
    // concat_ws would skip the nulls and give every broken doc the SAME
    // "" key — N broken docs banding together is N² garbage candidates;
    // null keys match nothing in the band equi-join
    val r = Seq(Tuple1(Option.empty[Seq[Long]])).toDF("sig")
      .select(TextHash.bandKeys(col("sig")).as("bk")).collect().head
    val bk = r.getSeq[Any](0)
    assert(bk.length == TextHash.NumBands && bk.forall(_ == null))
  }

  test("null input and null elements yield a null signature") {
    val r1 = Seq(Tuple1(Option.empty[Seq[Long]])).toDF("hs")
      .select(TextHash.minhashSig(col("hs")).as("sig")).collect().head
    assert(r1.isNullAt(0))
    // a partially-hashed list must not produce a plausible partial
    // signature that LSH then buckets on
    val r2 = Seq(Tuple1(Seq[Option[Long]](Some(5L), None)))
      .toDF("hs")
      .select(TextHash.minhashSig(col("hs")).as("sig")).collect().head
    assert(r2.isNullAt(0))
  }
}
