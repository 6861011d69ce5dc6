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

  test("maxDepth=0 is unbounded but a relation cycle terminates") {
    val rels = Seq(
      Relation("a", "b", "b_ref", "b_id", maxDepth = 0),
      Relation("b", "a", "a_ref", "a_id", maxDepth = 0))
    val out = Relate.fanOut(spark,
      seeds = Map("a" -> collA.filter(col("a_id") === 1)),
      collections = Map("a" -> collA, "b" -> collB),
      relations = rels)
    val byDepth = out.groupBy("rel_depth", "rel_namespace").count()
      .as[(Int, String, Long)].collect().toSet
    // depth 1: a→b fires once; depth 2: b→a fires once; then the cycle guard
    // stops re-firing a→b, so the loop ends instead of looping to safetyCap
    assert(byDepth == Set((1, "b", 1L), (2, "a", 1L)))
  }

  test("per-relation maxDepth bounds only that relation") {
    val rels = Seq(
      Relation("a", "b", "b_ref", "b_id", maxDepth = 1),
      Relation("b", "a", "a_ref", "a_id", maxDepth = 1))
    val out = Relate.fanOut(spark,
      seeds = Map("a" -> collA.filter(col("a_id") === 1)),
      collections = Map("a" -> collA, "b" -> collB),
      relations = rels)
    // a→b allowed at depth 1; b→a would need depth 2 > its maxDepth=1
    val byDepth = out.groupBy("rel_depth", "rel_namespace").count()
      .as[(Int, String, Long)].collect().toSet
    assert(byDepth == Set((1, "b", 1L)))
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
