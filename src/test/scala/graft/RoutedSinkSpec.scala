package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.config.{ConfiguredPipeline, GraftConfig}
import graft.operators.{FileContent, Relation}
import graft.sink.InMemorySinkBackend
import graft.source.ChangeEvent

/** The reference's full routeData topology (routeOp → routeData →
  * relate fan-out → file content → doIndexing, monstache.go:3464-3495)
  * composed end-to-end: the streaming sink driven through
  * [[ConfiguredPipeline.startRoutedSink]] must land the SAME state as
  * the batch twin ([[ConfiguredPipeline.routeData]] +
  * `SinkWriter.writeBatch`) over the same ops, with relations and file
  * namespaces configured. */
class RoutedSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ev(eid: Long, id: String, ns: String, op: String, ver: Long,
                 doc: String): ChangeEvent = {
    val Array(db, coll) = ns.split("\\.", 2)
    ChangeEvent(eid, id, db, coll, ns, op, ver * 1000L, ver, doc, 0.0,
      "oplog")
  }

  // app.t2 is a join-only relate source onto the parts "collection";
  // app.t0 indexes directly; parts are a file namespace with a 20-byte
  // cap, so part 1's short blob attaches and part 2's long one doesn't
  private val cfg = GraftConfig(
    relates = Seq(Relation("app.t2", "app.parts", "document.pk", "pk",
      matchFieldType = Some("long"), broadcastRelated = true)),
    mappings = Map("app.parts" -> "parts_idx"),
    indexFiles = true,
    fileNamespaces = Seq("app.parts"),
    maxFileSize = 20)

  private def partsDocs = {
    import spark.implicits._
    Seq(
      (1L, "1", """{"name":"bolt"}""", "short blob"),
      (2L, "2", """{"name":"nut"}""", "x".repeat(40)),
      (3L, "3", """{"name":"washer"}""", "also short")
    ).toDF("pk", "id", "document", "blob")
  }

  // chunk 1: a t2 change fanning out to part 1, a direct t0 insert, and
  // a t2 DELETE (skipDelete: relate source, no keep-src → dropped);
  // chunk 2: a later t2 change re-emitting part 1 (higher version wins)
  // and one fanning out to part 2 (over-cap blob)
  private val chunk1 = Seq(
    ev(0, "100", "app.t2", "i", 10, """{"pk":1}"""),
    ev(1, "7", "app.t0", "i", 11, """{"a":1}"""),
    ev(2, "101", "app.t2", "d", 12, null))
  private val chunk2 = Seq(
    ev(3, "100", "app.t2", "u", 20, """{"pk":1}"""),
    ev(4, "102", "app.t2", "i", 21, """{"pk":2}"""))

  private def snapshot(b: InMemorySinkBackend) =
    b.state.toMap.map { case (k, d) => (k, (d.namespace, d.version, d.document)) }

  test("streaming routed sink ≡ batch routeData twin, relations + files on") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val batchBackend = new InMemorySinkBackend
    graft.sink.SinkWriter.writeBatch(
      ConfiguredPipeline.routeData(cfg, collections = Map("app.parts" -> partsDocs),
        fileContentCol = "blob")((chunk1 ++ chunk2).toDF()),
      cfg, batchBackend)

    val streamBackend = new InMemorySinkBackend
    val ckpt = Files.createTempDirectory("graft-routed-ckpt").toString
    val mem = MemoryStream[ChangeEvent]
    mem.addData(chunk1)
    ConfiguredPipeline.startRoutedSink(cfg,
      collections = Map("app.parts" -> partsDocs), fileContentCol = "blob")(
      mem.toDF(), ckpt, streamBackend).awaitTermination()
    mem.addData(chunk2)
    ConfiguredPipeline.startRoutedSink(cfg,
      collections = Map("app.parts" -> partsDocs), fileContentCol = "blob")(
      mem.toDF(), ckpt, streamBackend).awaitTermination()

    assert(snapshot(streamBackend) == snapshot(batchBackend))

    // the state itself: part 1 stamped from its LAST trigger (v20) with
    // the short blob folded in; part 2 over-cap → no file key; part 3
    // never triggered; t0 direct; the t2 ops themselves join-only (and
    // the t2 delete skipped entirely — no tombstone reached the sink)
    assert(streamBackend.state.keySet ==
      Set(("parts_idx", "1"), ("parts_idx", "2"), ("app.t0", "7")))
    assert(streamBackend.state(("parts_idx", "1")).version == 20)
    assert(streamBackend.state(("parts_idx", "1")).document
      .contains("\"file\":"))
    assert(!streamBackend.state(("parts_idx", "2")).document
      .contains("\"file\":"))
    assert(streamBackend.state(("parts_idx", "1")).namespace == "app.parts")

    // the over-cap file skip is ADVISORY: the op indexed (without
    // content, asserted above) AND surfaced on the quarantine channel
    // with its reason — the reference logs the oversize skip
    // (monstache.go:1425-1429); both twins report it identically
    for (b <- Seq(batchBackend, streamBackend)) {
      assert(b.rejected.map(r => (r._2, r._4)).toSet ==
        Set(("app.parts", "oversized_file")),
        s"quarantine: ${b.rejected}")
      // part 1's under-cap re-emissions must NOT be tagged
      assert(b.rejected.size == 1)
    }
  }

  test("foldIntoDocument: canonical fold, pass-throughs, and no-op frames") {
    import spark.implicits._
    val df = Seq(
      ("1", """{"b":2,"a":1}""", "QQ=="),          // folds, sorted keys
      ("2", """{"a":1}""", null),                  // no content → untouched
      ("3", null.asInstanceOf[String], "QQ==")     // no doc (delete) → null
    ).toDF("id", "document", "file")
    val out = FileContent.foldIntoDocument(df)
      .orderBy("id").select("document").as[String].collect()
    assert(out(0) == """{"a":1,"b":2,"file":"QQ=="}""")
    assert(out(1) == """{"a":1}""")
    assert(out(2) == null)
    assert(!FileContent.foldIntoDocument(df).columns.contains("file"))
    // a frame that never attached content passes through by reference
    val bare = Seq(("1", "{}")).toDF("id", "document")
    assert(FileContent.foldIntoDocument(bare) eq bare)
  }

  test("foldIntoDocument: non-object documents forward byte-identical") {
    import spark.implicits._
    // valid JSON that cannot carry a `file` field: the document must
    // come back byte-for-byte (no whitespace/number canonicalization),
    // content dropped — same as the unparseable-doc error path
    val df = Seq(
      ("1", """[1,  2]""", "QQ=="),   // array, internal spacing preserved
      ("2", """42.50""", "QQ=="),     // scalar, no number re-rendering
      ("3", """not json""", "QQ==")   // unparseable
    ).toDF("id", "document", "file")
    val out = FileContent.foldIntoDocument(df)
      .orderBy("id").select("document").as[String].collect()
    assert(out.toSeq == Seq("""[1,  2]""", """42.50""", """not json"""))
  }
}
