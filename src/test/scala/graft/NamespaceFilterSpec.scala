package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{NamespaceFilter, NamespaceFilterConfig}

/** Drop-pass semantics of the namespace filter chain (F1-F4): drops always
  * pass the data include/exclude regexes (monstache.go:1456, 1533) but are
  * subject to their own drop-regex pair (1464-1472, 1541-1549). */
class NamespaceFilterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rows = Seq(
    // (namespace, operation)
    ("app.users", "i"), ("app.users", "drop_coll"),
    ("app.other", "u"), ("app.other", "drop_coll"),
    ("legacy.users", "i"), ("legacy.users", "drop_db"),
    ("monstache.meta", "i"), ("config.shards", "i"),
    ("app.system.indexes", "i"), ("app.fs.chunks", "i"))

  private def surviving(cfg: NamespaceFilterConfig): Set[(String, String)] =
    NamespaceFilter(rows.toDF("namespace", "operation"), cfg)
      .as[(String, String)].collect().toSet

  test("system guards drop config db, system.*, and GridFS chunks (F1)") {
    val got = surviving(NamespaceFilterConfig())
    assert(!got.exists(_._1 == "monstache.meta"))
    assert(!got.exists(_._1 == "config.shards"))
    assert(!got.exists(_._1 == "app.system.indexes"))
    assert(!got.exists(_._1 == "app.fs.chunks"))
    assert(got.contains(("app.users", "i")))
  }

  test("data include regex lets drop ops through (F2 vs monstache.go:1456)") {
    val got = surviving(NamespaceFilterConfig(include = Some("^app\\.users$")))
    assert(got.contains(("app.users", "i")))
    assert(!got.contains(("app.other", "u")))
    // drops pass the data include even when their ns does not match
    assert(got.contains(("app.other", "drop_coll")))
    assert(got.contains(("legacy.users", "drop_db")))
  }

  test("data exclude regex also lets drop ops through (F3)") {
    val got = surviving(NamespaceFilterConfig(exclude = Some("^legacy\\..*$")))
    assert(!got.contains(("legacy.users", "i")))
    assert(got.contains(("legacy.users", "drop_db")))
  }

  test("drop include/exclude pair applies only to drop ops (F4)") {
    val got = surviving(NamespaceFilterConfig(
      dropInclude = Some("^app\\..*$"), dropExclude = Some("^app\\.other$")))
    // data ops unaffected by the drop pair
    assert(got.contains(("legacy.users", "i")))
    // drop in app.users: passes include, not excluded
    assert(got.contains(("app.users", "drop_coll")))
    // drop in app.other: excluded by the drop pair
    assert(!got.contains(("app.other", "drop_coll")))
    // drop in legacy: fails the drop include
    assert(!got.contains(("legacy.users", "drop_db")))
  }
}
