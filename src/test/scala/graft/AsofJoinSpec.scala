package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsofJoin

/** Point-in-time join: backward/forward bounds, tie resolution, the
  * tolerance cut, NULL statements, and the incremental fold identity. */
class AsofJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def lf(rows: (Long, Long, Long)*) = {
    import spark.implicits._
    rows.toDF("lid", "k", "t")
  }
  private def rf(rows: (Long, Long, Long, java.lang.Double)*) = {
    import spark.implicits._
    rows.toDF("rid", "k", "rt", "v")
  }

  private def matches(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[Long]("lid") ->
      Option(r.getAs[java.lang.Long]("asof_rid")).map(_.longValue)).toMap

  test("backward: latest at-or-before wins; equality is inclusive") {
    val out = AsofJoin.asofBackward(
      lf((1L, 1L, 100L), (2L, 1L, 50L), (3L, 1L, 9L), (4L, 2L, 100L)),
      rf((10L, 1L, 10L, 1.0), (11L, 1L, 50L, 2.0), (12L, 1L, 60L, 3.0)),
      Seq("k"), col("t"), col("rt"), "rid")
    assert(matches(out) === Map(
      1L -> Some(12L), // 60 is the latest <= 100
      2L -> Some(11L), // same-instant right IS visible
      3L -> None, // nothing at-or-before 9
      4L -> None)) // key 2 has no rights
    val r1 = out.filter(col("lid") === 1L).collect()(0)
    assert(r1.getAs[Long]("asof_ts_us") === 60L)
    assert(r1.getAs[Double]("asof_v") === 3.0)
  }

  test("equal (key, ts) rights resolve to the largest tie — total order") {
    val out = AsofJoin.asofBackward(
      lf((1L, 1L, 50L)),
      rf((7L, 1L, 50L, 1.0), (9L, 1L, 50L, 2.0), (8L, 1L, 50L, 3.0)),
      Seq("k"), col("t"), col("rt"), "rid")
    assert(matches(out) === Map(1L -> Some(9L)))
  }

  test("tolerance cuts a too-old match to NULL, never to an older row") {
    val out = AsofJoin.asofBackward(
      lf((1L, 1L, 100L), (2L, 1L, 55L)),
      rf((10L, 1L, 10L, 1.0), (11L, 1L, 50L, 2.0)),
      Seq("k"), col("t"), col("rt"), "rid", toleranceUs = Some(20L))
    assert(matches(out) === Map(
      1L -> None, // latest is 50, lag 50 > 20 — and 10 must NOT step in
      2L -> Some(11L))) // lag 5 <= 20
  }

  test("a matched right row with a NULL payload field still matches") {
    val out = AsofJoin.asofBackward(
      lf((1L, 1L, 100L)),
      rf((10L, 1L, 10L, null), (11L, 1L, 60L, null)),
      Seq("k"), col("t"), col("rt"), "rid")
    val r = out.collect()(0)
    assert(r.getAs[java.lang.Long]("asof_rid") === 11L)
    assert(r.getAs[java.lang.Double]("asof_v") === null)
  }

  test("forward: earliest at-or-after wins; tolerance bounds the wait") {
    val out = AsofJoin.asofForward(
      lf((1L, 1L, 40L), (2L, 1L, 61L), (3L, 1L, 50L)),
      rf((10L, 1L, 10L, 1.0), (11L, 1L, 50L, 2.0), (12L, 1L, 60L, 3.0)),
      Seq("k"), col("t"), col("rt"), "rid", toleranceUs = Some(15L))
    assert(matches(out) === Map(
      1L -> Some(11L), // 50 is the earliest >= 40, wait 10 <= 15
      2L -> None, // nothing at-or-after 61
      3L -> Some(11L))) // inclusive at 50
  }

  test("NULL-key/ts rights never match; NULL-ts lefts survive unmatched") {
    import spark.implicits._
    val right = Seq(
      (10L, Some(1L), Some(10L), 1.0),
      (11L, None: Option[Long], Some(20L), 2.0), // null key: invisible
      (12L, Some(1L), None: Option[Long], 3.0)) // null ts: invisible
      .toDF("rid", "k", "rt", "v")
    val left = Seq((1L, Some(1L), Some(100L)), (2L, Some(1L), None),
      (3L, None: Option[Long], Some(100L)))
      .toDF("lid", "k", "t")
    val out = AsofJoin.asofBackward(left, right, Seq("k"),
      col("t"), col("rt"), "rid")
    assert(out.count() === 3) // every left row survives
    assert(matches(out) === Map(1L -> Some(10L), 2L -> None, 3L -> None))
  }

  test("incremental fold ≡ full-corpus asof; state is one row per key") {
    val allL = lf((1L, 1L, 10L), (2L, 1L, 30L), (3L, 1L, 70L),
      (4L, 2L, 40L), (5L, 2L, 80L))
    val allR = rf((10L, 1L, 5L, 1.0), (11L, 1L, 25L, 2.0),
      (12L, 1L, 65L, 3.0), (13L, 2L, 35L, 4.0))
    val full = AsofJoin.asofBackward(allL, allR, Seq("k"),
      col("t"), col("rt"), "rid", toleranceUs = Some(50L))

    def cut(df: org.apache.spark.sql.DataFrame, c: String,
            lo: Long, hi: Long) =
      df.filter(col(c) >= lo && col(c) < hi)
    val s0 = AsofJoin.emptyState(allR)
    val (o1, s1) = AsofJoin.asofBackwardIncremental(
      cut(allL, "t", 0L, 40L), cut(allR, "rt", 0L, 40L), s0,
      Seq("k"), col("t"), col("rt"), "rid", toleranceUs = Some(50L))
    val (o2, s2) = AsofJoin.asofBackwardIncremental(
      cut(allL, "t", 40L, 1000L), cut(allR, "rt", 40L, 1000L), s1,
      Seq("k"), col("t"), col("rt"), "rid", toleranceUs = Some(50L))
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getAs[Long]("lid"), Option(r.getAs[java.lang.Long]("asof_rid")),
        Option(r.getAs[java.lang.Long]("asof_ts_us")))
    assert(o1.unionByName(o2).collect().map(key).toSet ===
      full.collect().map(key).toSet)
    // state: exactly the latest right per key, right-shaped
    val st = s2.collect().map(r => r.getAs[Long]("k") ->
      (r.getAs[Long]("rid"), r.getAs[Long]("rt"))).toMap
    assert(st === Map(1L -> ((12L, 65L)), 2L -> ((13L, 35L))))
    assert(s2.columns.toSeq === allR.columns.toSeq)
  }

  test("incremental: a batch row behind the state raises loudly") {
    val s1 = AsofJoin.latestRights(rf((11L, 1L, 50L, 1.0)), Seq("k"),
      col("rt"), "rid")
    // left behind the compaction point
    val (o, _) = AsofJoin.asofBackwardIncremental(
      lf((1L, 1L, 40L)), rf(), s1, Seq("k"), col("t"), col("rt"), "rid")
    val e = intercept[Exception] { o.collect() }
    assert(e.getMessage.contains("time-partitioned"))
    // right behind the compaction point — raises on the state path
    val (_, s2) = AsofJoin.asofBackwardIncremental(
      lf(), rf((12L, 1L, 30L, 2.0)), s1, Seq("k"), col("t"), col("rt"),
      "rid")
    val e2 = intercept[Exception] { s2.collect() }
    assert(e2.getMessage.contains("time-partitioned"))
  }

  test("latestRights compacts to the (ts, tie)-max row per key") {
    val st = AsofJoin.latestRights(
      rf((10L, 1L, 10L, 1.0), (11L, 1L, 50L, 2.0), (12L, 1L, 50L, 3.0),
        (13L, 2L, 5L, 4.0)),
      Seq("k"), col("rt"), "rid")
    assert(st.collect().map(r => r.getAs[Long]("k") ->
      r.getAs[Long]("rid")).toMap === Map(1L -> 12L, 2L -> 13L))
  }
}
