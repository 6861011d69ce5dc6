package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.source.{Discovery, DirectReadManifest}

/** S4 discovery filtering + S5 stateful direct-read manifest: a restart
  * must skip namespaces completed in a prior run
  * (monstache.go:1704-1759, 5162-5172). */
class DiscoverySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("filterNamespaces applies system guards then the regex pair (S4/F8)") {
    val all = Seq("app.users", "app.logs", "admin.x", "local.oplog.rs",
      "config.shards", "monstache.meta", "app.system.profile", "legacy.users")
    assert(Discovery.filterNamespaces(all) ==
      Seq("app.users", "app.logs", "legacy.users"))
    assert(Discovery.filterNamespaces(all, include = Some("^app\\..*$")) ==
      Seq("app.users", "app.logs"))
    assert(Discovery.filterNamespaces(all, include = Some("^app\\..*$"),
      exclude = Some("^app\\.logs$")) == Seq("app.users"))
  }

  test("listCollections discovers the testdata tables deterministically") {
    val nss = Discovery.listCollections(spark, "/root/testdata/sf0.001")
    assert(nss.contains("app.lineitem") && nss.contains("app.documents"))
    assert(nss == nss.sorted)
  }

  test("manifest: completed namespaces are skipped after a restart (S5)") {
    val dir = Files.createTempDirectory("graft-manifest").toString
    val all = Seq("app.a", "app.b", "app.c")
    assert(DirectReadManifest.pending(spark, dir, all) == all)
    DirectReadManifest.markCompleted(spark, dir, "app.b")
    assert(DirectReadManifest.pending(spark, dir, all) == Seq("app.a", "app.c"))
    // idempotent completion + full completion
    DirectReadManifest.markCompleted(spark, dir, "app.b")
    DirectReadManifest.markCompleted(spark, dir, "app.a")
    DirectReadManifest.markCompleted(spark, dir, "app.c")
    assert(DirectReadManifest.pending(spark, dir, all).isEmpty)
  }
}
