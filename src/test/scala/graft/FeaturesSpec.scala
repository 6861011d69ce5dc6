package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{Features, Similarity}

/** Hashing-trick featurization: deterministic, dimension-exact, signed
  * counts; zero vectors for empty/NULL text; and the full text → vector
  * → sign-LSH composition finds exact dups at cosine 1. */
class FeaturesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def vecsOf(rows: Seq[(Long, String)], dim: Int = 16) = {
    import spark.implicits._
    Features.hashedTfVectors(rows.toDF("doc_id", "text"), dim = dim)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1))
      .toMap
  }

  test("vectors are dim-length, deterministic, and integer-valued") {
    val rows = Seq(1L -> "a b c a", 2L -> "x y z")
    val v1 = vecsOf(rows)
    val v2 = vecsOf(rows)
    assert(v1 === v2)
    assert(v1.values.forall(_.length == 16))
    assert(v1.values.flatten.forall(x => x == math.rint(x)))
    // doc 1 has 4 tokens: total absolute mass is at most 4 (collisions
    // with opposite signs can cancel, never inflate)
    assert(v1(1L).map(math.abs).sum <= 4.0)
    assert(v1(1L).map(math.abs).sum > 0.0)
  }

  test("identical texts featurize identically; empty and NULL are zero") {
    val v = vecsOf(Seq(1L -> "w1 w2 w3 w4", 2L -> "w1 w2 w3 w4",
      3L -> "", 4L -> null))
    assert(v(1L) === v(2L))
    assert(v(3L) === Seq.fill(16)(0.0))
    assert(v(4L) === Seq.fill(16)(0.0))
  }

  test("word multiplicity accumulates in the same bucket") {
    // "a" vs "a a a": same single bucket, 3x the magnitude
    val v = vecsOf(Seq(1L -> "a", 2L -> "a a a"))
    assert(v(2L) === v(1L).map(_ * 3.0))
  }

  test("tf-idf: rational idf weighs rare words N/df times the universal word") {
    import spark.implicits._
    // N=3: "c" in 2 docs (idf = 3000 DIV 2 = 1500), "r" in 1 (idf = 3000)
    val docs = Seq(1L -> "c", 2L -> "c", 3L -> "r").toDF("doc_id", "text")
    val census = Features.dfCensus(docs)
    val v = Features.hashedTfIdfVectors(docs, census, nDocs = 3L, dim = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(v(1L).map(math.abs).sum === 1500.0)
    assert(v(1L) === v(2L))
    assert(v(3L).map(math.abs).sum === 3000.0)
  }

  test("df census merges additively over doc-disjoint batches") {
    import spark.implicits._
    val b1 = Seq(1L -> "a b", 2L -> "a c").toDF("doc_id", "text")
    val b2 = Seq(3L -> "a b d").toDF("doc_id", "text")
    val merged = Features.mergeDfCensus(
        Features.dfCensus(b1), Features.dfCensus(b2))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = Features.dfCensus(b1.unionByName(b2))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged === full)
    assert(merged.values.max === 3L) // "a" in all three docs
  }

  test("tf-idf: a word unseen by the census reads maximally rare (df=1)") {
    import spark.implicits._
    val old = Seq(1L -> "a b", 2L -> "a c").toDF("doc_id", "text")
    val census = Features.dfCensus(old)
    val v = Features.hashedTfIdfVectors(
        Seq(9L -> "zz").toDF("doc_id", "text"), census, nDocs = 2L,
        dim = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(v(9L).map(math.abs).sum === 2000.0) // 2 * 1000 DIV 1
  }

  test("incremental tf-idf against the merged census equals the full-union run") {
    import spark.implicits._
    val old = Seq(1L -> "a b c", 2L -> "a d").toDF("doc_id", "text")
    val batch = Seq(10L -> "a b zz", 11L -> "d e").toDF("doc_id", "text")
    val union = old.unionByName(batch)
    val merged = Features.mergeDfCensus(
      Features.dfCensus(old), Features.dfCensus(batch))
    val inc = Features.hashedTfIdfVectors(batch, merged, nDocs = 4L, dim = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val full = Features.hashedTfIdfVectors(union,
        Features.dfCensus(union), nDocs = 4L, dim = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(inc === full.view.filterKeys(_ >= 10L).toMap)
    // and the rare word really did weigh in: zz (df=1) contributes
    // 4000 = nDocs * 1000 DIV 1 absolute mass somewhere in doc 10
    assert(inc(10L).map(math.abs).max >= 4000.0)
  }

  test("text -> hashed vector -> sign-LSH finds dups, zero docs stay inert") {
    import spark.implicits._
    val docs = Seq(
      1L -> "the quick brown fox jumps over the lazy dog again and again",
      2L -> "the quick brown fox jumps over the lazy dog again and again",
      3L -> "completely different words about an unrelated subject matter",
      4L -> "").toDF("doc_id", "text")
    val vecs = Features.hashedTfVectors(docs, dim = 16)
    val pairs = Similarity.signLshNearDupPairs(vecs, minCos = 0.99,
        dim = 16, idCol = "doc_id", vecCol = "v", planes = 8, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(pairs.keySet === Set((1L, 2L)))
    assert(pairs((1L, 2L)) === 1000000L)
  }

  test("BM25: hand-computed scores, length normalization, rank order") {
    import spark.implicits._
    // N = 3, T = 6, avgdl_milli = 6000 DIV 3 = 2000
    val docs = Seq(
      (1L, "apple banana apple"),   // dl 3, tf(apple) 2
      (2L, "banana cherry"),        // dl 2, no apple
      (3L, "apple")                 // dl 1, tf(apple) 1
    ).toDF("doc_id", "text")
    val q = Seq(("qa", "apple")).toDF("query_id", "qtext")
    val out = Features.bm25TopK(docs, q, k = 10)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .sortBy(_._2)
    // df(apple) = 2 → idf_micro = floor(1e6·ln(1 + 1.5/2.5))
    //            = floor(1e6·ln(1.6)) = 470003
    // dnorm_micro = 250000 + 375000·dl → d1: 1375000, d3: 625000
    // tfnorm_micro d1 = (2200000·2·10⁶) DIV (2·10⁶ + 1650000) = 1205479
    // tfnorm_micro d3 = (2200000·1·10⁶) DIV (10⁶ +  750000) = 1257142
    // score d1 = 470003·1205479 = 566578746437
    // score d3 = 470003·1257142 = 590860511426  → the SHORTER doc wins
    assert(out === Seq(
      ("qa", 1L, "3", 590860511426L),
      ("qa", 2L, "1", 566578746437L)))
  }

  test("BM25: score ties break by doc-id string order; unseen terms score nothing") {
    import spark.implicits._
    val docs = Seq(
      (10L, "kiwi mango"), (2L, "kiwi mango"), (3L, "plum")
    ).toDF("doc_id", "text")
    val q = Seq(("t", "kiwi"), ("zz", "qqqq")).toDF("query_id", "qtext")
    val out = Features.bm25TopK(docs, q, k = 2)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    // identical docs → identical scores → '10' < '2' in string order;
    // query 'zz' has no corpus term → no rows at all
    assert(out.toSeq.sortBy(_._2) === Seq(("t", 1L, "10"), ("t", 2L, "2")))
  }

  test("BM25 census: batch-merged scoring equals one-shot; split docs fold by tf sum") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple banana apple"), (2L, "apple cherry"),
      (3L, "banana banana plum"), (4L, "cherry plum date")
    ).toDF("doc_id", "text")
    val q = Seq(("qa", "apple banana"), ("qb", "plum")).toDF("query_id", "qtext")
    val full = Features.bm25TopK(docs, q, k = 4).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3))).toSeq
    val merged = Features.mergeBm25Census(
      Features.bm25Census(docs.filter(col("doc_id") % 2 === 0)),
      Features.bm25Census(docs.filter(col("doc_id") % 2 === 1)))
    val inc = Features.bm25TopKFromCensus(merged, q, k = 4).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3))).toSeq
    assert(inc.sorted === full.sorted)
    // a document whose text arrives split across batches folds by tf sum
    val splitDoc = Features.mergeBm25Census(
      Features.bm25Census(Seq((9L, "apple apple")).toDF("doc_id", "text")),
      Features.bm25Census(Seq((9L, "apple banana")).toDF("doc_id", "text")))
      .collect().map(r => r.getAs[String]("wh") -> r.getAs[Long]("tf")).toMap
    assert(splitDoc.values.toSeq.sorted === Seq(1L, 3L))
  }

  test("RRF: rank-only fusion, self-pair dropped, integer contributions") {
    import spark.implicits._
    // system A ranks (d1, d2); system B ranks (d2, d3); probe doc is q1
    val ranked = Seq(
      ("q1", "d1", 1L), ("q1", "d2", 2L),
      ("q1", "d2", 1L), ("q1", "d3", 2L),
      ("q1", "q1", 1L) // self retrieval from a third list — must vanish
    ).toDF("query_id", "doc_id", "rnk")
    val out = Features.rrfTopK(ranked, k = 3).collect()
      .map(r => (r.getLong(1), r.getString(2), r.getLong(3))).toSeq.sortBy(_._1)
    val c61 = 1000000000L / 61L // 16393442
    val c62 = 1000000000L / 62L // 16129032
    // d2: 61⁻¹+62⁻¹ beats d1: 61⁻¹ beats d3: 62⁻¹
    assert(out === Seq(
      (1L, "d2", c61 + c62), (2L, "d1", c61), (3L, "d3", c62)))
  }
}
