package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Routing, TransformRegistry}

/** Registry contract vs the reference: filter chain only sees data ops
  * (monstache.go:1502), global-then-ns mapper chaining with drop-break
  * (1001-1037), Drop/Skip/meta output contract (1039-1103), and
  * drop-on-update → delete (3295-3304). */
class TransformRegistrySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // (event_id, id, namespace, operation, version, document)
  private def env = Seq(
    (1L, "1", "app.a", "i", 10L, """{"k":1}"""),
    (2L, "1", "app.a", "u", 20L, """{"k":2}"""),
    (3L, "2", "app.a", "u", 21L, """{"k":3}"""),
    (4L, "3", "app.b", "i", 30L, """{"k":4}"""),
    (5L, "4", "app.a", "d", 40L, null),
    (6L, "5", "app.c", "u", 50L, """{"k":9}""")
  ).toDF("event_id", "id", "namespace", "operation", "version", "document")

  test("filters apply only to data ops; deletes always pass (F5)") {
    val reg = TransformRegistry(filters = Map(
      "" -> (get_json_object(col("document"), "$.k").cast("int") < 9),
      "app.a" -> (col("version") >= 20L)))
    val kept = reg.applyFilters(env).select("event_id").as[Long].collect().toSet
    // 1: app.a data, version 10 < 20 → filtered by ns chain
    // 6: k=9 fails the global filter
    // 5: delete, no data → passes unconditionally
    assert(kept == Set(2L, 3L, 4L, 5L))
  }

  test("dropped update becomes a delete with the +2 offset; dropped insert vanishes (P11)") {
    val reg = TransformRegistry(mappers = Map(
      "app.a" -> (df => df.withColumn("m_drop",
        get_json_object(col("document"), "$.k").cast("int") <= 2))))
    val out = reg(env)
    val byId = out.select("event_id", "operation", "version", "document")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getString(3))).toMap
    assert(!byId.contains(1L)) // dropped insert is gone
    // dropped update → delete but the version keeps the UPDATE offset +1:
    // the reference versions it via tsVersion while op.IsUpdate() is still
    // true (doIndex → doDelete, monstache.go:3295-3304, 4053-4063)
    assert(byId(2L) == (("d", 20L, null)))
    assert(byId(3L)._1 == "u") // k=3 survives
    assert(byId(5L) == (("d", 40L, null))) // original delete untouched
  }

  test("global mapper drop short-circuits the namespace mapper (JS chain break)") {
    val reg = TransformRegistry(mappers = Map(
      "" -> (df => df.withColumn("m_drop", col("namespace") === "app.b")),
      "app.b" -> (df => df.withColumn("m_meta_index", lit("never")))))
    val out = reg(env)
    // app.b's insert was dropped globally → gone, and its mapper never ran
    assert(out.filter(col("namespace") === "app.b").count() == 0)
    assert(out.filter(col("m_meta_index") === "never").count() == 0)
  }

  test("skip and meta overrides surface through Routing.withMeta (P2/P3)") {
    val reg = TransformRegistry(mappers = Map(
      "app.a" -> (df => df
        .withColumn("m_skip", col("operation") === "i")
        .withColumn("m_meta_routing", lit("shard9"))
        .withColumn("m_meta_version", col("version") * 100))))
    val out = Routing.withMeta(reg(env))
    val r2 = out.filter(col("event_id") === 2L).collect().head
    assert(r2.getAs[String]("meta_routing") == "shard9")
    assert(r2.getAs[Long]("meta_version") == 2000L)
    val skipped = out.filter(col("meta_skip")).select("event_id").as[Long].collect().toSet
    assert(skipped == Set(1L)) // only app.a's insert
    // non-mapped namespaces keep defaults
    val r4 = out.filter(col("event_id") === 4L).collect().head
    assert(r4.getAs[String]("meta_routing") == "3")
    assert(r4.getAs[Long]("meta_version") == 30L)
  }
}
