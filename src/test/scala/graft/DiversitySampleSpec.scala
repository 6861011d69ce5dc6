package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Similarity

/** Cluster-balanced selection on hand-built clusters: both arms keep the
  * right rows, ranks follow the integer-cosine order with string-id
  * ties, the cap binds per cluster, and unassignable vectors never
  * appear. */
class DiversitySampleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // two obvious clusters around the axes; angles strictly ordered
  private def frame() = {
    import spark.implicits._
    Seq(
      (1L, Array(1.0f, 0.0f)),     // centroid of cluster 1
      (2L, Array(0.95f, 0.05f)),   // very central in 1
      (3L, Array(0.8f, 0.2f)),     // less central in 1
      (4L, Array(0.6f, 0.4f)),     // least central in 1
      (5L, Array(0.0f, 1.0f)),     // centroid of cluster 5
      (6L, Array(0.1f, 0.9f)),     // central in 5
      (7L, Array(0.0f, 0.0f))      // zero-norm: unassignable
    ).toDF("vec_id", "embedding")
  }

  private def cents() = Similarity.collectCentroids(
    frame().filter(col("vec_id").isin(1L, 5L)))

  private def run(cap: Int, central: Boolean) =
    Similarity.diversitySample(frame(), cents(), cap, central)
      .collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("rnk")) ->
        r.getAs[Long]("vec_id")).toMap

  test("central arm keeps the most centroid-similar rows in rank order") {
    val m = run(cap = 2, central = true)
    assert(m === Map((1L, 1L) -> 1L, (1L, 2L) -> 2L,
      (5L, 1L) -> 5L, (5L, 2L) -> 6L))
  }

  test("diverse arm keeps the least centroid-similar rows; cap binds per cluster") {
    val m = run(cap = 2, central = false)
    // cluster 1 has members 1,2,3,4 → least central are 4 then 3
    assert(m === Map((1L, 1L) -> 4L, (1L, 2L) -> 3L,
      (5L, 1L) -> 6L, (5L, 2L) -> 5L))
  }

  test("cap above cluster size keeps everything assigned, never the zero-norm row") {
    val m = run(cap = 10, central = true)
    assert(m.values.toSet === Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(m.count { case ((b, _), _) => b == 1L } === 4)
  }

  test("incremental fold: later batches displace kept rows; replay absorbs; fold equals full") {
    val c = cents()
    val all = frame()
    val batches = Seq(
      all.filter(col("vec_id").isin(1L, 2L, 6L)),
      all.filter(col("vec_id").isin(3L, 7L)),
      all.filter(col("vec_id").isin(4L, 5L)))
    def fold(central: Boolean) = batches.foldLeft(
      Similarity.emptyDiversityState(spark)) { (st, b) =>
      Similarity.diversitySampleIncremental(b, st, c, cap = 2, central)
    }
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("rnk")) ->
        r.getAs[String]("id").toLong).toMap
    // diverse arm: batch 1 keeps (1,2) for cluster 1; 3 then 4 displace both
    val divSt = fold(central = false)
    assert(asMap(Similarity.diversityReportFromState(divSt, keepCentral = false))
      === Map((1L, 1L) -> 4L, (1L, 2L) -> 3L, (5L, 1L) -> 6L, (5L, 2L) -> 5L))
    // replaying the last batch changes nothing
    val replayed = Similarity.diversitySampleIncremental(batches(2), divSt,
      c, cap = 2, keepCentral = false)
    assert(asMap(Similarity.diversityReportFromState(replayed, keepCentral = false))
      === asMap(Similarity.diversityReportFromState(divSt, keepCentral = false)))
    // central arm folds to the full-corpus selection too
    assert(asMap(Similarity.diversityReportFromState(fold(central = true),
      keepCentral = true))
      === Map((1L, 1L) -> 1L, (1L, 2L) -> 2L, (5L, 1L) -> 5L, (5L, 2L) -> 6L))
  }

  test("streaming chain: folded state equals single-pass; replay recomputes from predecessor") {
    val stateDir = java.nio.file.Files.createTempDirectory("graft-div").toString
    val c = cents()
    val all = frame()
    val batches = Seq(
      all.filter(col("vec_id") <= 2L),
      all.filter(col("vec_id").isin(3L, 4L)),
      all.filter(col("vec_id") >= 5L))
    batches.zipWithIndex.foreach { case (b, i) =>
      graft.streaming.StreamingDiversity.foldBatch(b, i.toLong, stateDir,
        c, cap = 2, keepCentral = false)
    }
    def sample() = graft.streaming.StreamingDiversity
      .latestSample(spark, stateDir, keepCentral = false).get
      .collect().map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("rnk")) ->
        r.getAs[String]("id").toLong).toMap
    val want = Map((1L, 1L) -> 4L, (1L, 2L) -> 3L,
      (5L, 1L) -> 6L, (5L, 2L) -> 5L)
    assert(sample() === want)
    graft.streaming.StreamingDiversity.foldBatch(batches(2), 2L, stateDir,
      c, cap = 2, keepCentral = false)
    assert(sample() === want)
  }

  test("a replayed id with a CONFLICTING embedding raises, not dupes") {
    import spark.implicits._
    val s1 = Similarity.diversitySampleIncremental(frame(),
      Similarity.emptyDiversityState(spark), cents(), cap = 2,
      keepCentral = true)
    // id 2 is in the kept state; redeliver it with a different vector —
    // the pre-fix distinct() kept BOTH rows and the state silently
    // exceeded the cap/pure-function-of-id-set contract
    val mutated = Seq((2L, Array(0.5f, 0.5f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Similarity.diversitySampleIncremental(mutated, s1, cents(), cap = 2,
        keepCentral = true).collect()
    }
    def chain(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ chain(x.getCause))
    assert(chain(e).exists(_.contains("conflicting")))
    // an IDENTICAL replay still absorbs
    val replay = Similarity.diversitySampleIncremental(
      frame().filter(col("vec_id") === 2L), s1, cents(), cap = 2,
      keepCentral = true)
    assert(replay.collect().length == s1.collect().length)
  }

  test("exact cosine ties break by the id's string form ascending") {
    import spark.implicits._
    // 2 and 10 are identical vectors → identical cos_scaled; '10' < '2'
    val f = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.7f, 0.3f)),
      (10L, Array(0.7f, 0.3f))).toDF("vec_id", "embedding")
    val c = Similarity.collectCentroids(f.filter(col("vec_id") === 1L))
    val kept = Similarity.diversitySample(f, c, cap = 2, keepCentral = false)
      .collect().map(r => r.getAs[Long]("rnk") -> r.getAs[Long]("vec_id")).toMap
    assert(kept === Map(1L -> 10L, 2L -> 2L))
  }
}
