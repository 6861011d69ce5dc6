package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Routing, TransformRegistry}

/** Executes docs/MIGRATION.md's four worked JS→registry translations
  * verbatim and pins their routed output to the reference's script
  * semantics (drop-on-falsy, document rewrite, filter chain,
  * `_meta_monstache` overrides) — the doc's code blocks are these
  * registries; if the guide drifts from the engine this spec breaks. */
class MigrationGuideSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def users = Seq(
    (1L, "1", "app.users", "i", 10L,
      """{"k":1,"private":"true","status":"active","first":"ada","last":"byron"}"""),
    (2L, "2", "app.users", "u", 20L,
      """{"k":2,"private":"false","status":"active","first":"alan","last":"turing"}"""),
    (3L, "3", "app.users", "u", 30L,
      """{"k":3,"private":"true","status":"inactive","first":"x","last":"y"}"""),
    (4L, "4", "app.users", "d", 40L, null)
  ).toDF("event_id", "id", "namespace", "operation", "version", "document")

  test("example 1: drop private documents (falsy return = m_drop)") {
    val reg = TransformRegistry(mappers = Map(
      "app.users" -> (df => df.withColumn("m_drop",
        get_json_object(col("document"), "$.private") === "true"))))
    val out = reg(users).select("event_id", "operation", "version")
      .as[(Long, String, Long)].collect().toSet
    // dropped insert (1) vanishes; dropped update (3) becomes a delete
    // keeping the UPDATE's version; survivors untouched
    assert(out === Set((2L, "u", 20L), (3L, "d", 30L), (4L, "d", 40L)))
  }

  test("example 2: rewrite the document (enrich/rename as projection)") {
    val reg = TransformRegistry(mappers = Map(
      "app.users" -> (df => df.withColumn("document", to_json(struct(
        concat_ws(" ",
          get_json_object(col("document"), "$.first"),
          get_json_object(col("document"), "$.last")).as("full_name"),
        get_json_object(col("document"), "$.k").cast("int").as("k")))))))
    val doc = reg(users).filter(col("event_id") === 2L)
      .select("document").as[String].head()
    assert(doc === """{"full_name":"alan turing","k":2}""")
    // the delete's null document is untouched
    assert(reg(users).filter(col("event_id") === 4L)
      .select("document").head().isNullAt(0))
  }

  test("example 3: [[filter]] keeps active docs; deletes always pass") {
    val reg = TransformRegistry(filters = Map(
      "app.users" -> (get_json_object(col("document"), "$.status")
        === "active")))
    val kept = reg.applyFilters(users).select("event_id")
      .as[Long].collect().toSet
    assert(kept === Set(1L, 2L, 4L)) // 3 inactive; 4 delete passes
  }

  test("example 4: _meta_monstache routing overrides") {
    val orders = Seq(
      (1L, "1", "app.orders", "i", 10L,
        """{"region":"eu","code":"A7"}"""),
      (2L, "2", "app.other", "i", 11L, """{"region":"us"}"""))
      .toDF("event_id", "id", "namespace", "operation", "version",
        "document")
    val reg = TransformRegistry(mappers = Map(
      "app.orders" -> (df => df
        .withColumn("m_meta_index", concat(lit("orders-"),
          get_json_object(col("document"), "$.region")))
        .withColumn("m_meta_id",
          get_json_object(col("document"), "$.code"))
        .withColumn("m_meta_routing",
          get_json_object(col("document"), "$.region")))))
    val out = Routing.withMeta(reg(orders))
      .select("event_id", "meta_index", "meta_id", "meta_routing")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getString(3))).toMap
    assert(out(1L) === (("orders-eu", "A7", "eu")))
    // unregistered namespace keeps the derived defaults
    assert(out(2L)._1 === "app.other")
  }
}
