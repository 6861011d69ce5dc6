package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._
import graft.source.ChangeEvent

/** Sink identity is per COLLECTION, not global: collections freely reuse
  * ids (sequential integer `_id`s are the MongoDB norm), so every keyed
  * operator must key on (namespace, id) when a namespace is present —
  * plus the null-handling traps that silently lose rows. */
class OperatorIdentitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ev(eid: Long, id: String, ns: String, op: String, ver: Long,
                 doc: String = """{"k":1}""") = {
    val Array(db, coll) = ns.split("\\.", 2)
    ChangeEvent(eid, id, db, coll, ns, op, 1000L + eid, ver, doc, 0.0, "oplog")
  }

  test("LWW: equal ids in different namespaces never clobber each other") {
    import spark.implicits._
    val ops = Seq(
      ev(1, "7", "app.a", "i", 100),
      ev(2, "7", "app.b", "i", 900), // same id, other collection, NEWER
      ev(3, "7", "app.a", "u", 200),
      ev(4, "7", "app.b", "d", 950)) // deletes ONLY app.b's doc
    val live = Upsert.liveDocuments(ops.toDF())
      .select("namespace", "id", "version")
      .as[(String, String, Long)].collect().toSet
    // app.a's doc must survive app.b's delete of the same id
    assert(live == Set(("app.a", "7", 200L)))
    val dead = Upsert.tombstones(ops.toDF())
      .select("namespace", "id").as[(String, String)].collect().toSet
    assert(dead == Set(("app.b", "7")))
  }

  test("patch chains never interleave across namespaces sharing an id") {
    import spark.implicits._
    val ops = Seq(
      ev(1, "1", "app.a", "i", 100, """{"a":1}"""),
      ev(2, "1", "app.b", "i", 150, """{"b":1}"""),
      ev(3, "1", "app.a", "u", 200, """{"a":2}"""))
    val pairs = PatchLog.pairs(ops.toDF(), Seq("app.a", "app.b"))
      .select("namespace", "id", "v", "prev_document", "document")
      .as[(String, String, Int, String, String)].collect().toSet
    // each collection's chain starts at v=1 with prev=null; app.a's
    // second patch diffs app.a's OWN insert, not app.b's
    assert(pairs == Set(
      ("app.a", "1", 1, null, """{"a":1}"""),
      ("app.b", "1", 1, null, """{"b":1}"""),
      ("app.a", "1", 2, """{"a":1}""", """{"a":2}""")))
  }

  test("a mapper that projects away control columns loses no inserts") {
    import spark.implicits._
    val ops = Seq(ev(1, "x", "app.t0", "i", 100), ev(2, "y", "app.t0", "u", 200))
    // the mapper rebuilds the frame WITHOUT m_drop/m_skip — the union
    // reinstates them as NULL, which must read as not-dropped
    val reg = TransformRegistry(mappers = Map(
      "app.t0" -> (df => df.select("event_id", "id", "db", "coll",
        "namespace", "operation", "ts_us", "version", "document", "value",
        "source"))))
    val out = reg(ops.toDF()).select("id", "operation")
      .as[(String, String)].collect().toSet
    assert(out == Set(("x", "i"), ("y", "u")))
  }

  test("a NULL namespace passes through the registry unmapped, not dropped") {
    import spark.implicits._
    val ops = Seq(
      ev(1, "x", "app.t0", "i", 100),
      ChangeEvent(2L, "y", "app", "t0", null, "u", 1002L, 200L,
        """{"k":2}""", 0.0, "oplog"))
    val reg = TransformRegistry(mappers = Map(
      "app.t0" -> (df => df.withColumn("tagged", lit(true)))))
    val out = reg(ops.toDF()).select("id").as[String].collect().toSet
    assert(out == Set("x", "y"))
  }

  test("withMeta passes drop ops through; the live view still excludes them") {
    import spark.implicits._
    val ops = Seq(
      ev(1, "x", "app.t0", "i", 100),
      ChangeEvent(2L, null, "app", "t0", "app.t0", "drop_coll", 1002L, 0L,
        null, 0.0, "oplog"))
    val routed = Routing.withMeta(ops.toDF())
    assert(routed.filter(col("operation") === "drop_coll").count() == 1,
      "the drop op must survive routing for the K3 chain")
    val live = Upsert.liveDocuments(routed).select("id").as[String].collect()
    assert(live.toSeq == Seq("x"), "the live view holds documents only")
  }

  test("mixed-case dropDatabase still covers its indexes") {
    import spark.implicits._
    val ops = Seq(
      ChangeEvent(1L, "x", "Sales", "orders", "Sales.orders", "i", 1001L,
        100L, """{"k":1}""", 0.0, "oplog"),
      ChangeEvent(2L, null, "Sales", null, "Sales", "drop_db", 1002L, 500L,
        null, 0.0, "oplog"),
      ChangeEvent(3L, "y", "Sales", "orders", "Sales.orders", "i", 1003L,
        900L, """{"k":2}""", 0.0, "oplog"))
    val row = DropPropagation.indexSurvival(ops.toDF())
      .select("ix", "last_drop_version", "n_after_drop")
      .as[(String, Option[Long], Long)].collect().toSeq
    assert(row == Seq(("sales.orders", Some(500L), 1L)),
      "the drop must cover the index despite the db's mixed case")
  }

  test("recoverAndPropagate joins envelope-shaped collections unambiguously") {
    import spark.implicits._
    // both lastKnown and related carry their own `version` column — the
    // exact shape EventLog envelopes have
    val deletes = Seq("1").toDF("id")
    val lastKnown = Seq(("1", "c9", 100L)).toDF("id", "cust_ref", "version")
    val related = Seq(("c9", "Carol", 77L)).toDF("cust_id", "name", "version")
    val out = DeleteStrategies.recoverAndPropagate(
        deletes, lastKnown, "cust_ref", related, "cust_id")
      .select("src_id", "cust_id", "operation", "rel_version")
      .as[(String, String, String, Long)].collect().toSeq
    assert(out == Seq(("1", "c9", "d", 102L)))
  }
}
