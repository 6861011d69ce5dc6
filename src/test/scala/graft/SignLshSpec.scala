package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Similarity

/** Sign-random-projection LSH near-dedup: recall on deterministic
  * fixtures (exact dup, dominated-perturbation near-dup), complement
  * rejection, broken/zero-vector quarantine, and the quadratic-bucket
  * cap. dim=4, planes=8, bands=4 keeps the expected band keys
  * hand-checkable: for vectors whose first component dominates
  * (|x₀| > Σ|xᵢ|), every plane bit equals the bit of sign(x₀·s_p0),
  * so such vectors band together iff their first components share sign. */
class SignLshSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def pairsOf(rows: Seq[(Long, Seq[java.lang.Double])],
                      minCos: Double = 0.9,
                      cap: Option[Int] = None) = {
    import spark.implicits._
    val df = rows.toDF("vec_id", "v")
    Similarity.signLshNearDupPairs(df, minCos = minCos, dim = 4,
        idCol = "vec_id", vecCol = "v", planes = 8, bands = 4,
        maxBucketSize = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
  }

  private def d(x: Double): java.lang.Double = Double.box(x)

  test("exact dup and dominated perturbation pair; complement does not") {
    // b's first component dominates -> identical bits to a -> all 4
    // bands collide; c = -a has every bit flipped -> zero shared bands
    val out = pairsOf(Seq(
      1L -> Seq(d(1.0), d(0.0), d(0.0), d(0.0)),
      2L -> Seq(d(1.0), d(0.0), d(0.0), d(0.0)),
      3L -> Seq(d(0.99), d(0.1), d(0.0), d(0.0)),
      4L -> Seq(d(-1.0), d(0.0), d(0.0), d(0.0))))
    assert(out.contains((1L, 2L)) && out((1L, 2L)) === 1000000L)
    assert(out.contains((1L, 3L)) && out.contains((2L, 3L)))
    // cos(a, b) = 0.99 / sqrt(0.99^2 + 0.1^2) ~= 0.99493
    assert(out((1L, 3L)) === math.floor(
      0.99 / math.sqrt(0.99 * 0.99 + 0.1 * 0.1) * 1e6).toLong)
    assert(!out.keys.exists { case (x, y) => x == 4L || y == 4L })
  }

  test("zero-norm vectors band (all bits 1) but never verify (NULL cos)") {
    val out = pairsOf(Seq(
      1L -> Seq(d(0.0), d(0.0), d(0.0), d(0.0)),
      2L -> Seq(d(0.0), d(0.0), d(0.0), d(0.0))))
    assert(out.isEmpty)
  }

  test("broken vectors (null element / wrong length) are quarantined") {
    val out = pairsOf(Seq(
      1L -> Seq(d(1.0), d(0.0), d(0.0), d(0.0)),
      2L -> Seq(d(1.0), null, d(0.0), d(0.0)),
      3L -> Seq(d(1.0), d(0.0), d(0.0))))
    assert(out.isEmpty)
  }

  test("non-finite elements (NaN / ±Inf) are quarantined before signing") {
    // without quarantine, the NaN vector's dots are NaN -> bit 0 here but
    // bit 1 in DuckDB (NaN orders above all values) — the one cross-engine
    // bit-parity divergence in the embedding family; cleanVec enforces the
    // finite-data contract instead of assuming it
    val out = pairsOf(Seq(
      1L -> Seq(d(1.0), d(0.0), d(0.0), d(0.0)),
      2L -> Seq(d(1.0), d(Double.NaN), d(0.0), d(0.0)),
      3L -> Seq(d(Double.PositiveInfinity), d(0.0), d(0.0), d(0.0)),
      4L -> Seq(d(1.0), d(Double.NegativeInfinity), d(0.0), d(0.0))))
    assert(out.isEmpty)
  }

  test("quadratic-bucket cap drops oversized buckets") {
    val many = (1L to 5L).map(i =>
      i -> Seq(d(1.0), d(0.0), d(0.0), d(0.0)))
    assert(pairsOf(many).size === 10) // uncapped: all C(5,2) pairs
    assert(pairsOf(many, cap = Some(4)).isEmpty) // every bucket holds 5
  }

  private def sign(rows: Seq[(Long, Seq[java.lang.Double])]) = {
    import spark.implicits._
    Similarity.signVectors(rows.toDF("vec_id", "v"), dim = 4,
      idCol = "vec_id", vecCol = "v", planes = 8, bands = 4)
  }

  test("incremental ≡ full-batch restricted to pairs touching the new batch") {
    import spark.implicits._
    val old = Seq(
      1L -> Seq(d(1.0), d(0.0), d(0.0), d(0.0)),
      2L -> Seq(d(1.0), d(0.01), d(0.0), d(0.0)),
      3L -> Seq(d(0.0), d(0.0), d(1.0), d(0.0)))
    // 11 near-dups old 1 and 2 (new-old pairs); 12 near-dups 11
    // (new-new); 13 is novel
    val nw = Seq(
      11L -> Seq(d(0.99), d(0.05), d(0.0), d(0.0)),
      12L -> Seq(d(0.99), d(0.06), d(0.0), d(0.0)),
      13L -> Seq(d(0.0), d(0.0), d(0.0), d(1.0)))
    val full = pairsOf(old ++ nw)
    val restricted = full.filter { case ((a, b), _) => a >= 11L || b >= 11L }
    val (inc, allSigned) = Similarity.signLshIncrementalPairs(
      nw.toDF("vec_id", "v"), sign(old), minCos = 0.9, dim = 4,
      idCol = "vec_id", vecCol = "v", planes = 8, bands = 4)
    val incM = inc.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(incM === restricted)
    assert(incM.keySet.exists { case (a, b) => a < 11L }) // new-old found
    assert(incM.contains((11L, 12L)))                     // new-new found
    assert(!incM.keys.exists { case (x, y) => x == 13L || y == 13L })
    // old-old pairs (1,2) are previous runs' output, never re-emitted
    assert(!incM.contains((1L, 2L)))
    // the returned frame is the next artifact: old ∪ new, one row per id
    val ids = allSigned.select("__id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === Seq(1L, 2L, 3L, 11L, 12L, 13L))
  }

  test("a re-delivered id is represented by its NEW signing only") {
    import spark.implicits._
    val old = Seq(
      1L -> Seq(d(1.0), d(0.0), d(0.0), d(0.0)),
      2L -> Seq(d(1.0), d(0.01), d(0.0), d(0.0)))
    // id 2 arrives again, now orthogonal to 1: the (1,2) pair must NOT
    // appear (its old signature is anti-joined away)
    val nw = Seq(2L -> Seq(d(0.0), d(1.0), d(0.0), d(0.0)))
    val (inc, allSigned) = Similarity.signLshIncrementalPairs(
      nw.toDF("vec_id", "v"), sign(old), minCos = 0.9, dim = 4,
      idCol = "vec_id", vecCol = "v", planes = 8, bands = 4)
    assert(inc.collect().isEmpty)
    assert(allSigned.count() === 2)
    // and the artifact carries the NEW vector for id 2
    val v2 = allSigned.filter(col("__id") === 2L)
      .select("v").collect().head.getSeq[Double](0)
    assert(v2 === Seq(0.0, 1.0, 0.0, 0.0))
  }

  /** Seeded near-dup-rich embedding fixture: base vectors plus small
    * perturbations (+1000). dim=16, planes=16, bands=2 (rows=8) makes
    * single-probe collisions genuinely hard — a pair must agree on 8
    * consecutive bits — so the prefix-split miss actually occurs. */
  private def embFixture: Seq[(Long, Seq[java.lang.Double])] = {
    val rnd = new scala.util.Random(42)
    val base = (0 until 60).map { i =>
      i.toLong -> Seq.fill(16)(d(rnd.nextGaussian()))
    }
    val near = base.map { case (id, v) =>
      (id + 1000L) -> v.map(x => d(x + 0.12 * rnd.nextGaussian()))
    }
    base ++ near
  }

  private def multiPairs(rows: Seq[(Long, Seq[java.lang.Double])],
                         probes: Int) = {
    import spark.implicits._
    Similarity.multiProbeSignLshPairs(rows.toDF("vec_id", "v"),
        minCos = 0.9, dim = 16, probes = probes, idCol = "vec_id",
        vecCol = "v", planes = 16, bands = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("multi-probe is a superset of single-probe and equals it at probes=1") {
    import spark.implicits._
    val docs = embFixture
    val single = Similarity.signLshNearDupPairs(docs.toDF("vec_id", "v"),
        minCos = 0.9, dim = 16, idCol = "vec_id", vecCol = "v",
        planes = 16, bands = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(multiPairs(docs, 1) === single)
    assert(single.subsetOf(multiPairs(docs, 4)))
  }

  test("rotated probes recover prefix-split pairs single-probe misses") {
    import spark.implicits._
    val docs = embFixture
    // ground truth: ALL pairs at cos >= 0.9 (tiny fixture — the
    // all-pairs join is affordable here and ONLY here)
    val df = docs.toDF("vec_id", "v")
    val truth = df.alias("a").join(df.alias("b"),
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        org.apache.spark.sql.functions.expr(
          "aggregate(zip_with(a.v, b.v, (x, y) -> x * y), 0D, (s, x) -> s + x)" +
            " / (sqrt(aggregate(transform(a.v, x -> x * x), 0D, (s, x) -> s + x))" +
            " * sqrt(aggregate(transform(b.v, x -> x * x), 0D, (s, x) -> s + x)))")
          .as("cos"))
      .filter(col("cos") >= 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val single = multiPairs(docs, 1)
    val multi = multiPairs(docs, 4)
    assert((truth -- single).nonEmpty,
      "fixture has no prefix-split pair — weaken nothing, fix the fixture")
    assert(multi.subsetOf(truth))
    assert((multi -- single).nonEmpty)
    assert(multi.size > single.size)
  }

  test("pairsFromBits ≡ per-tier sign passes at every (bands, probes)") {
    import spark.implicits._
    val docs = embFixture
    val df = docs.toDF("vec_id", "v")
    val bits = Similarity.signBitsArtifact(df, dim = 16, idCol = "vec_id",
      vecCol = "v", planes = 16)
    def setOf(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
        .toMap
    // probes = 1: the base tier's exact numbers (cos_scaled included)
    assert(setOf(Similarity.pairsFromBits(bits, minCos = 0.9,
        planes = 16, bands = 2)) ===
      setOf(Similarity.signLshNearDupPairs(df, minCos = 0.9, dim = 16,
        idCol = "vec_id", vecCol = "v", planes = 16, bands = 2)))
    // probes > 1: the rotated-view tier's exact numbers
    assert(setOf(Similarity.pairsFromBits(bits, minCos = 0.9,
        planes = 16, bands = 2, probes = 4)) ===
      setOf(Similarity.multiProbeSignLshPairs(df, minCos = 0.9, dim = 16,
        probes = 4, idCol = "vec_id", vecCol = "v", planes = 16,
        bands = 2)))
  }

  test("signMatrix is deterministic and ±1-valued") {
    val m1 = Similarity.signMatrix(8, 4)
    val m2 = Similarity.signMatrix(8, 4)
    assert(m1.map(_.toSeq).toSeq === m2.map(_.toSeq).toSeq)
    assert(m1.flatten.forall(v => v == 1.0 || v == -1.0))
    // not degenerate: both signs occur
    assert(m1.flatten.distinct.length === 2)
  }
}
