package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Relate, Relation}

/** fanOut semantics: per-relation depth bounds (0 = unbounded), cycle
  * termination, and keep-src emission (monstache.go:1221-1358, 3419-3462). */
class RelateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // two collections forming a cycle a → b → a
  private def collA = Seq((1, 10), (2, 20)).toDF("a_id", "b_ref")
  private def collB = Seq((10, 1), (20, 2)).toDF("b_id", "a_ref")

  test("maxDepth=0 is unbounded but a relation cycle terminates at safetyCap") {
    val rels = Seq(
      Relation("a", "b", "b_ref", "b_id", keepSrc = true, maxDepth = 0),
      Relation("b", "a", "a_ref", "a_id", keepSrc = true, maxDepth = 0))
    val out = Relate.fanOut(spark,
      seeds = Map("a" -> collA.filter(col("a_id") === 1)),
      collections = Map("a" -> collA, "b" -> collB),
      relations = rels, safetyCap = 5)
    val byDepth = out.groupBy("rel_depth", "rel_namespace").count()
      .as[(Int, String, Long)].collect().toSet
    // the cycle alternates a→b→a…, one doc per wave, truncated after 5
    // waves (the reference has no cycle guard — it load-sheds on queue
    // overflow; the cap is the deterministic replacement)
    assert(byDepth == Set((0, "a", 1L), (1, "b", 1L), (2, "a", 1L),
      (3, "b", 1L), (4, "a", 1L), (5, "b", 1L)))
  }

  test("a DAG re-entry wave still propagates onward (no global edge guard)") {
    // a→b and a→c→b: b gets waves at depth 1 and depth 2; b→d must fire
    // for BOTH waves (ADVICE r2: a global once-per-edge guard dropped the
    // second wave's d docs, diverging from monstache.go:1327-1341)
    val a = Seq((1, 100, 200)).toDF("a_id", "b_ref", "c_ref")
    val b = Seq((100, 7), (300, 7)).toDF("b_id", "d_ref")
    val c = Seq((200, 300)).toDF("c_id", "b_ref2")
    val d = Seq((7, "leaf")).toDF("d_id", "d_val")
    val rels = Seq(
      Relation("a", "b", "b_ref", "b_id"),
      Relation("a", "c", "c_ref", "c_id"),
      Relation("c", "b", "b_ref2", "b_id"),
      Relation("b", "d", "d_ref", "d_id"))
    val out = Relate.fanOut(spark,
      seeds = Map("a" -> a),
      collections = Map("b" -> b, "c" -> c, "d" -> d),
      relations = rels)
    val dWaves = out.filter(col("rel_namespace") === "d")
      .select("rel_depth").as[Int].collect().toSeq.sorted
    // d reached from the depth-1 b wave (at 2) and the depth-2 b wave (at 3)
    assert(dWaves == Seq(2, 3))
  }

  test("per-relation maxDepth bounds only that relation") {
    val rels = Seq(
      Relation("a", "b", "b_ref", "b_id", keepSrc = true, maxDepth = 1),
      Relation("b", "a", "a_ref", "a_id", keepSrc = true, maxDepth = 1))
    val out = Relate.fanOut(spark,
      seeds = Map("a" -> collA.filter(col("a_id") === 1)),
      collections = Map("a" -> collA, "b" -> collB),
      relations = rels)
    // a→b allowed at depth 1; b→a would need depth 2 > its maxDepth=1
    val byDepth = out.groupBy("rel_depth", "rel_namespace").count()
      .as[(Int, String, Long)].collect().toSet
    assert(byDepth == Set((0, "a", 1L), (1, "b", 1L)))
  }

  test("join-only intermediate namespaces are not emitted at any depth") {
    // chain a→b→d where b is join-only (has an onward relation, none
    // keepSrc): b's docs propagate to d but are not indexed themselves
    // (routeDataRelate, monstache.go:3419-3462)
    val a = Seq((1, 100)).toDF("a_id", "b_ref")
    val b = Seq((100, 7)).toDF("b_id", "d_ref")
    val d = Seq((7, "leaf")).toDF("d_id", "d_val")
    val rels = Seq(
      Relation("a", "b", "b_ref", "b_id"),
      Relation("b", "d", "d_ref", "d_id"))
    val out = Relate.fanOut(spark,
      seeds = Map("a" -> a),
      collections = Map("b" -> b, "d" -> d),
      relations = rels)
    val nss = out.select("rel_namespace").as[String].collect().toSet
    assert(nss == Set("d")) // a join-only (rel, no keepSrc); b join-only; d leaf
  }

  test("dotted src-field reads the document; matchFieldType coerces the key") {
    val changes = Seq(
      (1L, """{"ref":{"key":"10"}}"""),
      (2L, """{"ref":{"key":"20"}}"""),
      (3L, null.asInstanceOf[String]))
      .toDF("event_id", "document")
    val related = Seq((10L, "x"), (20L, "y"), (30L, "z")).toDF("rid", "val")
    val got = Relate.hop(changes, related,
        Relation("a", "b", "document.ref.key", "rid",
          matchFieldType = Some("long")))
      .as[(Long, String)].collect().toSet
    assert(got == Set((10L, "x"), (20L, "y")))
  }

  test("keepSrc emits the seed docs at depth 0; join-only namespaces do not") {
    val rels = Seq(Relation("a", "b", "b_ref", "b_id", keepSrc = true, maxDepth = 1))
    val out = Relate.fanOut(spark,
      seeds = Map("a" -> collA),
      collections = Map("b" -> collB),
      relations = rels)
    val depths = out.select("rel_depth").as[Int].collect().toSeq.sorted
    assert(depths == Seq(0, 0, 1, 1)) // 2 seeds kept + 2 related emitted

    val joinOnly = Relate.fanOut(spark,
      seeds = Map("a" -> collA),
      collections = Map("b" -> collB),
      relations = Seq(Relation("a", "b", "b_ref", "b_id", maxDepth = 1)))
    assert(joinOnly.select("rel_depth").as[Int].collect().forall(_ == 1))
  }
}
