package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.config.{ConfiguredPipeline, GraftConfig, Toml}

/** The TOML front door's edge behavior: escape-aware quote scanning (an
  * escaped BACKSLASH before a quote must not be misread as an escaped
  * quote), comment stripping inside vs outside strings, and the
  * direct-read key's three-way semantics (omitted → none, `[""]` →
  * dynamic discovery, explicit list → exactly those). */
class TomlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("escaped backslash before a closing quote still closes the string") {
    // value is a single backslash; the `#` after it is a real comment
    val doc = Toml.parse("""k = "a\\"  # trailing comment""")
    assert(doc.root("k") == "a\\")
  }

  test("escaped quote keeps the string open across a # character") {
    val doc = Toml.parse("""k = "a\"#b"  # comment""")
    assert(doc.root("k") == "a\"#b")
  }

  test("array split is escape-aware too") {
    val doc = Toml.parse("""k = ["a\\", "b,c", "d\"e"]""")
    assert(doc.strings("k") == Seq("a\\", "b,c", "d\"e"))
  }

  test("malformed strings are rejected, not silently misparsed") {
    // interior unescaped quote: `"^a" "b$"` must not parse to `^a" "b$`
    val e1 = intercept[IllegalArgumentException](
      Toml.parse("""k = "^a" "b$""""))
    assert(e1.getMessage.contains("malformed string"))
    // unterminated: the final quote is escaped, so the string never closes
    val e2 = intercept[IllegalArgumentException](
      Toml.parse("""k = "abc\""""))
    assert(e2.getMessage.contains("malformed string"))
  }

  test("[mapping]/[relate] single-bracket tables are rejected loudly") {
    val e = intercept[IllegalArgumentException](GraftConfig.fromToml(
      "[mapping]\nnamespace = \"app.t0\"\nindex = \"custom\"\n"))
    assert(e.getMessage.contains("[[mapping]]"))
    // the correct array-of-tables form still works
    val cfg = GraftConfig.fromToml(
      "[[mapping]]\nnamespace = \"app.t0\"\nindex = \"custom\"\n")
    assert(cfg.mappings == Map("app.t0" -> "custom"))
  }

  test("index-as-update without mergeFields is a loud error, with them a merge") {
    import spark.implicits._
    val cfg = GraftConfig.fromToml("index-as-update = true")
    val ops = Seq(
      graft.source.ChangeEvent(1L, "k", "app", "t0", "app.t0", "i",
        10L, 40L, """{"k":1}""", 1.0, "oplog"),
      graft.source.ChangeEvent(2L, "k", "app", "t0", "app.t0", "u",
        11L, 44L, """{"x":7}""", 2.0, "oplog"),
      // a second key whose FINAL op is a delete: doc-as-upsert indexing
      // does not suspend deletes, so "gone" must not appear in the merge
      graft.source.ChangeEvent(3L, "gone", "app", "t0", "app.t0", "i",
        12L, 48L, """{"k":9}""", 3.0, "oplog"),
      graft.source.ChangeEvent(4L, "gone", "app", "t0", "app.t0", "d",
        13L, 52L, null, 4.0, "oplog")).toDF()
    val e = intercept[IllegalArgumentException](
      ConfiguredPipeline.indexedDocuments(cfg)(ops))
    assert(e.getMessage.contains("mergeFields"))
    // with the field list: per-field latest-non-null merge — the k from
    // the insert survives the update that omitted it
    val reg = graft.operators.TransformRegistry(mappers = Map("" -> (df => df
      .withColumn("k", get_json_object(col("document"), "$.k").cast("int"))
      .withColumn("x", get_json_object(col("document"), "$.x").cast("int")))))
    val merged = ConfiguredPipeline
      .indexedDocuments(cfg, reg, mergeFields = Seq("k", "x"))(ops)
      .select("id", "k", "x").as[(String, Int, Int)].collect().toSeq
    assert(merged == Seq(("k", 1, 7)))
  }

  test("file/stats config keys drive the S7/K5 helpers") {
    import spark.implicits._
    val cfg = GraftConfig.fromToml(
      """index-files = true
        |file-namespaces = ["app.fs.files"]
        |max-file-size = 8
        |stats = true
        |index-stats = true
        |stats-duration = "30s"""".stripMargin)
    assert(cfg.maxFileSize == 8L && cfg.fileNamespaces == Seq("app.fs.files"))
    val df = Seq(
      ("app.fs.files", "tiny"), ("app.fs.files", "far-too-long-content"),
      ("app.other", "tiny")).toDF("namespace", "content")
    val out = ConfiguredPipeline.attachFiles(cfg)(df, "content")
      .select("namespace", "file").collect()
      .map(r => (r.getString(0), Option(r.getString(1)))).toSeq
    // only the configured file-namespace, only under the cap; everything
    // else indexes without content (null file), never dropped
    val tinyB64 = java.util.Base64.getEncoder.encodeToString("tiny".getBytes)
    assert(out == Seq(("app.fs.files", Some(tinyB64)),
      ("app.fs.files", None), ("app.other", None)))
    // reference default (index-files = false): frame passes through
    // untouched — no file column, no stats frame
    val off = GraftConfig.fromToml("")
    assert(!ConfiguredPipeline.attachFiles(off)(df, "content")
      .columns.contains("file"))
    assert(ConfiguredPipeline.bulkStats(off)(df).isEmpty)
    // stats frames: dated index name only under index-stats
    val env = Seq(graft.source.ChangeEvent(1L, "7", "app", "t0", "app.t0",
      "i", 1700000000000000L, 4L, """{"k":1}""", 1.0, "oplog")).toDF()
    val dated = ConfiguredPipeline.bulkStats(cfg)(env).get
    assert(dated.columns.contains("stats_index"))
    assert(dated.select("stats_index").as[String].head()
      .startsWith("monstache.stats."))
    val logOnly = GraftConfig.fromToml("stats = true")
    assert(!ConfiguredPipeline.bulkStats(logOnly)(env).get
      .columns.contains("stats_index"))
    // the stats cadence maps onto a processing-time trigger
    import org.apache.spark.sql.streaming.Trigger
    assert(ConfiguredPipeline.statsTrigger(cfg) == Trigger.ProcessingTime(30000L))
    assert(ConfiguredPipeline.statsTrigger(off) == Trigger.AvailableNow())
  }

  test("drop, delete-protection, prune, and stats-format toggles follow the reference") {
    import spark.implicits._
    import graft.source.ChangeEvent
    // dropped-collections = false: the drop_coll is a no-op and the
    // index survives it (doDrop skips the delete)
    val ops = Seq(
      ChangeEvent(1L, "1", "app", "t0", "app.t0", "i", 100L, 400L, "{}",
        1.0, "oplog"),
      ChangeEvent(2L, "", "app", "t0", "app.t0", "drop_coll", 101L, 404L,
        null, 0.0, "oplog")).toDF()
    val survOn = ConfiguredPipeline.indexSurvival(
      GraftConfig.fromToml(""))(ops).select("survives").as[Boolean].head()
    val survOff = ConfiguredPipeline.indexSurvival(
      GraftConfig.fromToml("dropped-collections = false"))(ops)
      .select("survives").as[Boolean].head()
    assert(!survOn && survOff)

    // prune-invalid-json: the hot path sanitizes documents BEFORE mappers
    val dirty = Seq(ChangeEvent(1L, "1", "app", "t0", "app.t0", "i", 100L,
      400L, """{"b":1,"w":"NaN"}""", 1.0, "oplog")).toDF()
    def doc(cfg: GraftConfig) = ConfiguredPipeline.hotPath(cfg)(dirty)
      .select("document").as[String].head()
    assert(doc(GraftConfig.fromToml("prune-invalid-json = true")) == """{"b":1}""")
    assert(doc(GraftConfig.fromToml("")) == """{"b":1,"w":"NaN"}""")

    // routing-namespaces + disable-delete-protection: two sink docs under
    // one id — protected refuses, delete-by-query deletes; a non-routed
    // namespace deletes directly at the default-resolved index
    val deletes = Seq(
      ("7", "app.routed", "d"), ("8", "app.plain", "d"))
      .toDF("id", "namespace", "operation")
    val sink = Seq(("7", "ix_a", "r1"), ("7", "ix_b", "r2"))
      .toDF("id", "meta_index", "meta_routing")
    def statuses(toml: String) = ConfiguredPipeline.statelessDeletes(
        GraftConfig.fromToml(toml))(deletes, sink)
      .select("id", "status").as[(String, String)].collect().toMap
    val protectedRun = statuses("routing-namespaces = [\"app.routed\"]")
    assert(protectedRun("7") == "refused" && protectedRun("8") == "deleted")
    val byQuery = statuses(
      "routing-namespaces = [\"app.routed\"]\ndisable-delete-protection = true")
    assert(byQuery("7") == "deleted")
    // by-query emits one row PER hit with that hit's REAL coordinates —
    // not one row with independent min(index)/min(routing), which could
    // name a (index, routing) pair no sink doc has
    val hits7 = ConfiguredPipeline.statelessDeletes(GraftConfig.fromToml(
        "routing-namespaces = [\"app.routed\"]\ndisable-delete-protection = true"))(
        deletes, sink)
      .filter(col("id") === "7")
      .select("hit_index", "hit_routing").as[(String, String)]
      .collect().toSet
    assert(hits7 == Set("ix_a" -> "r1", "ix_b" -> "r2"))

    // stats-index-format: a custom Go layout, lowercased like the
    // reference's strings.ToLower(t.Format(...))
    val cfgFmt = GraftConfig.fromToml(
      "index-stats = true\nstats-index-format = \"Stats.2006\"")
    val env = Seq(ChangeEvent(1L, "7", "app", "t0", "app.t0", "i",
      1700000000000000L, 4L, "{}", 1.0, "oplog")).toDF()
    assert(ConfiguredPipeline.bulkStats(cfgFmt)(env).get
      .select("stats_index").as[String].head() == "stats.2023")
  }

  test("mistyped values are loud errors naming the key and the found type") {
    val doc = Toml.parse(
      """namespace-regex = true
        |delete-strategy = "2"
        |index-as-update = 1
        |patch-namespaces = "db.c"""".stripMargin)
    val e1 = intercept[IllegalArgumentException](doc.str("namespace-regex"))
    assert(e1.getMessage.contains("namespace-regex") &&
      e1.getMessage.contains("boolean"))
    val e2 = intercept[IllegalArgumentException](doc.int("delete-strategy"))
    assert(e2.getMessage.contains("delete-strategy") &&
      e2.getMessage.contains("string"))
    val e3 = intercept[IllegalArgumentException](doc.bool("index-as-update"))
    assert(e3.getMessage.contains("index-as-update") &&
      e3.getMessage.contains("integer"))
    val e4 = intercept[IllegalArgumentException](doc.strings("patch-namespaces"))
    assert(e4.getMessage.contains("patch-namespaces") &&
      e4.getMessage.contains("array"))
    // an out-of-Int-range integer must be loud, not a silent wrap (a
    // wrapped max-depth = 4294967296 would turn relate recursion off)
    val big = Toml.parse("max-depth = 4294967296")
    val e5 = intercept[IllegalArgumentException](big.int("max-depth"))
    assert(e5.getMessage.contains("max-depth"))
    // well-typed lookups still work, absent keys still default
    val ok = Toml.parse("delete-strategy = 1\nverbose = true")
    assert(ok.int("delete-strategy") == 1 && ok.bool("verbose"))
    assert(ok.str("namespace-regex").isEmpty && ok.int("missing", 7) == 7)
  }

  test("[[relate]] entries with mistyped or missing keys fail loudly") {
    val mistyped =
      """[[relate]]
        |namespace = 5
        |with-namespace = "a.b"
        |src-field = "x"
        |match-field = "_id"""".stripMargin
    val e = intercept[IllegalArgumentException](GraftConfig.fromToml(mistyped))
    assert(e.getMessage.contains("relate.namespace") &&
      e.getMessage.contains("integer"))
    val missing = "[[relate]]\nnamespace = \"a.b\""
    val e2 = intercept[IllegalArgumentException](GraftConfig.fromToml(missing))
    assert(e2.getMessage.contains("with-namespace"))
  }

  test("property: escape round-trip over hostile strings (quotes, backslashes, #)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def esc(s: String): String = s.flatMap {
      case '\\' => "\\\\"
      case '"' => "\\\""
      case '\n' => "\\n"
      case '\t' => "\\t"
      case '\r' => "\\r"
      case c => c.toString
    }
    val hostile = Gen.listOf(Gen.oneOf('a', 'b', '\\', '"', '#', ',', ' ',
      '\n', '\t', '=', '[', ']')).map(_.mkString)
    val gen = for {
      v <- hostile
      xs <- Gen.listOfN(3, hostile)
    } yield (v, xs)
    val cases = Gen.listOfN(300, gen)
      .apply(Gen.Parameters.default, Seed(7L)).get
    cases.foreach { case (v, xs) =>
      val text =
        s"""k = "${esc(v)}"  # trailing comment with " and \\
           |arr = [${xs.map(x => "\"" + esc(x) + "\"").mkString(", ")}]
           |""".stripMargin
      val doc = Toml.parse(text)
      assert(doc.root("k") == v, s"k mismatch for ${esc(v)}")
      assert(doc.strings("arr") == xs, s"arr mismatch for $xs")
    }
  }

  test("unsupported escapes and syntax fail loudly with the line number") {
    val e1 = intercept[IllegalArgumentException](Toml.parse("k = \"\\q\""))
    assert(e1.getMessage.contains("line 1"))
    val e2 = intercept[IllegalArgumentException](Toml.parse("\nk = 1979-05-27"))
    assert(e2.getMessage.contains("line 2"))
  }

  test("directRead: omitted key means NO direct reads, not scan-everything") {
    val cfg = GraftConfig.fromToml("namespace-regex = \"^app\\\\.\"")
    assert(cfg.directReadNamespaces.isEmpty)
    val df = ConfiguredPipeline.directRead(cfg, spark, "/root/testdata/sf0.001")
    assert(df.isEmpty)
  }

  test("directRead: the [\"\"] convention turns on dynamic discovery") {
    val cfg = GraftConfig.fromToml(
      """direct-read-namespaces = [""]
        |direct-read-dynamic-include-regex = "^app\\.(region|nation)$"
        |""".stripMargin)
    val df = ConfiguredPipeline.directRead(cfg, spark, "/root/testdata/sf0.001")
    val nss = df.select("namespace").distinct()
      .collect().map(_.getString(0)).toSet
    assert(nss == Set("app.region", "app.nation"))
  }

  test("directRead: an explicit list reads exactly those namespaces") {
    val cfg = GraftConfig.fromToml("""direct-read-namespaces = ["app.region"]""")
    val df = ConfiguredPipeline.directRead(cfg, spark, "/root/testdata/sf0.001")
    val nss = df.select("namespace").distinct()
      .collect().map(_.getString(0)).toSet
    assert(nss == Set("app.region"))
  }
}
