package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{Centroid, Pq, PqCodebook}

/** Product quantization on hand-computable fixtures: training moves
  * per-subspace centroids to bucket means, encoding picks nearest codes
  * with the lower-id tie-break, ADC ranks by exact integer distance
  * sums, and broken vectors are quarantined everywhere. */
class PqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // dim=4, m=2 (subDim=2). Two natural clusters per subspace:
  // front half near (0,0)/(10,10), back half near (0,10)/(10,0).
  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, Seq(0.0, 0.0, 0.0, 10.0)),
      (2L, Seq(0.2, 0.0, 0.0, 10.2)),
      (3L, Seq(10.0, 10.0, 10.0, 0.0)),
      (4L, Seq(10.2, 10.0, 10.0, 0.2)),
      (5L, Seq(0.0, 0.2, 10.0, 0.0))
    ).toDF("vec_id", "embedding")
  }

  test("training moves each subspace's centroids to its bucket means") {
    // seeds 1 and 3; 1 iteration. Subspace 0 buckets: {1,2,5}->cid 1,
    // {3,4}->cid 3. Means: (0.2+0.0+0.0)/3 etc., on floor(x*1e6) ints.
    val cb = Pq.train(corpus, col("vec_id").isin(1L, 3L), dim = 4, m = 2,
      iters = 1)
    assert(cb.m === 2 && cb.subDim === 2)
    // mean = (Σ floor(x·1e6)) / (1e6·n): {0.0, 0.2, 0.0} → 200000/3e6
    val third = 200000.0 / 3e6
    val s0 = cb.books(0).map(c => c.id -> c.vec.toSeq).toMap
    assert(s0(1L) === Seq(third, third))
    assert(s0(3L) === Seq(10.1, 10.0))
    // subspace 1 buckets: {1,2} -> cid1 mean (0, 10.1); {3,4,5} -> cid3
    val s1 = cb.books(1).map(c => c.id -> c.vec.toSeq).toMap
    assert(s1(1L) === Seq(0.0, 10.1))
    assert(s1(3L) === Seq(10.0, third))
  }

  test("encode picks the nearest code per subspace; ties go to the lower id") {
    import spark.implicits._
    // untrained codebook straight from two seeds
    val cb = PqCodebook(4, 2, Array(
      Array(Centroid(1L, Array(0.0, 0.0), 0.0),
        Centroid(3L, Array(10.0, 10.0), 0.0)),
      Array(Centroid(1L, Array(0.0, 10.0), 0.0),
        Centroid(3L, Array(10.0, 0.0), 0.0))))
    val codes = Pq.encode(corpus, cb)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(codes(1L) === Seq(1L, 1L))
    assert(codes(3L) === Seq(3L, 3L))
    assert(codes(5L) === Seq(1L, 3L))
    // exact midpoint ties to the lower centroid id
    val mid = Seq((9L, Seq(5.0, 5.0, 5.0, 5.0))).toDF("vec_id", "embedding")
    val midCodes = Pq.encode(mid, cb)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(midCodes(9L) === Seq(1L, 1L))
  }

  test("adc top-k ranks by integer distance sum with id tie-break") {
    val cb = Pq.train(corpus, col("vec_id").isin(1L, 3L), dim = 4, m = 2,
      iters = 1)
    val top = Pq.adcTopK(corpus, cb, col("vec_id") === 1L, k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2),
        r.getLong(3)))
      .sortBy(t => t._2)
    assert(top.map(_._1).forall(_ == 1L))
    // doc 2 shares doc 1's codes exactly -> same LUT entries; doc 5
    // shares the subspace-0 code only. Ranks: 2 first (same-code), then
    // 5, then one of the far pair.
    assert(top(0)._3 === 2L)
    assert(top(1)._3 === 5L)
    // same-code candidates tie exactly -> the earlier id wins rank 3
    assert(top(2)._3 === 3L)
    // ADC of the same-code twin equals q's own reconstruction distance
    assert(top(0)._4 >= 0L)
    assert(top(0)._4 < top(1)._4 && top(1)._4 < top(2)._4)
  }

  test("residuals vanish on coarse seeds; buckets follow cosine assignment") {
    import graft.llm.Similarity
    val coarse = Similarity.collectCentroids(
      corpus.filter(col("vec_id").isin(1L, 3L)), "vec_id", "embedding")
    val res = Pq.residualFrame(corpus, coarse)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getSeq[Double](2))))
      .toMap
    assert(res(1L)._1 === 1L && res(1L)._2.forall(_ == 0.0))
    assert(res(3L)._1 === 3L && res(3L)._2.forall(_ == 0.0))
    assert(res(2L)._1 === 1L)
    assert(res(4L)._1 === 3L)
    // v5 = (0, 0.2, 10, 0): orthogonal to c1, positive cosine with c3
    assert(res(5L)._1 === 3L)
    assert(res(5L)._2 === Seq(-10.0, -9.8, 0.0, 0.0))
  }

  test("ivf-adc: probes restrict candidates and ranks match recomputed ADC") {
    import spark.implicits._
    import graft.llm.Similarity
    val all = corpus.unionByName(
      Seq((6L, Seq(0.0, 0.0, 0.0, 10.0))).toDF("vec_id", "embedding"))
    val coarse = Similarity.collectCentroids(
      all.filter(col("vec_id").isin(1L, 3L)), "vec_id", "embedding")
    val cb = Pq.trainResidual(all, coarse, col("vec_id").isin(2L, 5L),
      dim = 4, m = 2, iters = 1)
    // nprobe=1: query 1 probes its own bucket only -> candidates {2, 6}
    val t1 = Pq.ivfAdcTopK(all, coarse, cb, col("vec_id") === 1L,
      k = 5, nprobe = 1).collect()
    assert(t1.map(_.getLong(2)).toSet === Set(2L, 6L))
    assert(t1.map(_.getLong(3)).toSet === Set(1L))
    // nprobe=2: bucket 3's members become reachable
    val t2 = Pq.ivfAdcTopK(all, coarse, cb, col("vec_id") === 1L,
      k = 10, nprobe = 2).collect()
    assert(t2.map(_.getLong(2)).toSet === Set(2L, 3L, 4L, 5L, 6L))

    // recompute every ADC from the public codebook + the encode output
    // and assert the ranking is exactly (adc ASC, id ASC)
    def l2(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) =>
        acc + (x - y) * (x - y) }
    val codes = Pq.encode(Pq.residualFrame(all, coarse), cb,
        "vec_id", "rv", carry = Seq("bucket"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getSeq[Long](2))))
      .toMap
    val qv = Seq(0.0, 0.0, 0.0, 10.0)
    val cents = coarse.map(c => c.id -> c.vec.toSeq).toMap
    val expected = codes.toSeq.filter(_._1 != 1L).map {
      case (id, (bucket, cs)) =>
        val qres = qv.zip(cents(bucket)).map { case (x, c) => x - c }
        val adc = cs.zipWithIndex.map { case (code, s) =>
          val qs = qres.slice(s * 2, (s + 1) * 2)
          val cv = cb.books(s).find(_.id == code).get.vec.toSeq
          math.floor(1e6 * l2(qs, cv)).toLong
        }.sum
        (id, adc)
    }.sortBy(t => (t._2, t._1))
    val got = t2.sortBy(_.getInt(1))
      .map(r => (r.getLong(2), r.getLong(4))).toSeq
    assert(got === expected)
  }

  test("persisted index probes equal in-memory; unprobed buckets unread") {
    import graft.llm.Similarity
    val coarse = Similarity.collectCentroids(
      corpus.filter(col("vec_id").isin(1L, 3L)), "vec_id", "embedding")
    val cb = Pq.trainResidual(corpus, coarse, col("vec_id").isin(2L, 5L),
      dim = 4, m = 2, iters = 1)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-pq-index").toString
    Pq.writeIndex(corpus, coarse, cb, dir)

    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    val queries = corpus.filter(col("vec_id") === 1L)
    val fromIndex = canon(Pq.ivfAdcTopKFromIndex(queries, dir,
      k = 5, nprobe = 1))
    val inMemory = canon(Pq.ivfAdcTopK(corpus, coarse, cb,
      col("vec_id") === 1L, k = 5, nprobe = 1))
    assert(fromIndex === inMemory && fromIndex.nonEmpty)

    // partition-pruning proof: corrupt every data file of the UNPROBED
    // bucket (query 1 probes bucket 1 only) — the probe must not notice
    val b3 = new java.io.File(dir, "bucket=3")
    assert(b3.exists)
    b3.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
      java.nio.file.Files.write(f.toPath, Array[Byte](0, 1, 2, 3))
    }
    assert(canon(Pq.ivfAdcTopKFromIndex(queries, dir,
      k = 5, nprobe = 1)) === inMemory)
    // and the coarse + codebook round-trip is exact
    val rc = Pq.readCoarse(spark, dir)
    assert(rc.map(_.id).toSeq === coarse.map(_.id).toSeq)
    assert(rc.map(_.vec.toSeq).toSeq === coarse.map(_.vec.toSeq).toSeq)
    val rcb = Pq.readCodebook(spark, dir)
    assert(rcb.dim === cb.dim && rcb.m === cb.m)
    assert(rcb.books.map(_.map(c => c.id -> c.vec.toSeq).toSeq).toSeq ===
      cb.books.map(_.map(c => c.id -> c.vec.toSeq).toSeq).toSeq)
  }

  test("index append: frozen-geometry codes equal a rebuild; replay no-ops") {
    import spark.implicits._
    import graft.llm.Similarity
    val b1 = corpus.filter(col("vec_id") <= 3L)
    val b2 = corpus.filter(col("vec_id") > 3L).unionByName(
      Seq((6L, Seq(0.0, 0.0, 0.0, 10.0))).toDF("vec_id", "embedding"))
    val coarse = Similarity.collectCentroids(
      b1.filter(col("vec_id").isin(1L, 3L)), "vec_id", "embedding")
    val cb = Pq.trainResidual(b1, coarse, col("vec_id").isin(2L, 3L),
      dim = 4, m = 2, iters = 1)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-pq-append").toString
    Pq.writeIndex(b1, coarse, cb, dir)
    Pq.appendToIndex(b2, dir)

    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    val queries = corpus.filter(col("vec_id") === 1L)
    val appended = canon(Pq.ivfAdcTopKFromIndex(queries, dir,
      k = 10, nprobe = 2))
    // same frozen coarse + codebooks over the full corpus, in memory
    val rebuild = canon(Pq.ivfAdcTopK(b1.unionByName(b2), coarse, cb,
      col("vec_id") === 1L, k = 10, nprobe = 2))
    assert(appended === rebuild)
    assert(appended.map(_._3).contains(6L)) // the appended twin is found
    // at-least-once re-delivery: the manifest anti-join appends nothing
    Pq.appendToIndex(b2, dir)
    assert(canon(Pq.ivfAdcTopKFromIndex(queries, dir,
      k = 10, nprobe = 2)) === rebuild)
    assert(spark.read.parquet(dir).count() ===
      b1.count() + b2.count())
  }

  test("broken vectors are quarantined from seeds, codes, and queries") {
    import spark.implicits._
    val dirty = corpus.unionByName(Seq(
      (90L, Seq(1.0, 2.0, 3.0)), // wrong length
      (91L, Seq(Double.NaN, 0.0, 0.0, 0.0)),
      (92L, null.asInstanceOf[Seq[Double]])
    ).toDF("vec_id", "embedding"))
    val cb = Pq.train(dirty, col("vec_id").isin(1L, 3L, 90L, 91L),
      dim = 4, m = 2, iters = 1)
    assert(cb.books(0).map(_.id).toSeq === Seq(1L, 3L))
    val codes = Pq.encode(dirty, cb).collect().map(_.getLong(0)).toSet
    assert(codes === Set(1L, 2L, 3L, 4L, 5L))
    // a broken query row simply produces no result rows
    val top = Pq.adcTopK(dirty, cb, col("vec_id").isin(1L, 91L), k = 2)
    assert(top.filter(col("query_id") === 91L).count() === 0L)
    assert(top.filter(col("query_id") === 1L).count() === 2L)
  }
}
