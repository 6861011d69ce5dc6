package graft.config

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.codec.Codecs
import graft.operators._

/** The engine's config-file surface: the subset of the reference's TOML
  * options (`configOptions`, monstache.go:280-450; loaded by `mustConfig`
  * 2106-2504) that drives in-scope operators. Connection/TLS/HTTP options
  * have no analog here (zero-egress build); scripts/plugins map to the
  * code-registered [[TransformRegistry]] — in the reference those are
  * code too (JS files / compiled plugins), selected by config.
  *
  * Key names match the reference's TOML tags exactly, so a monstache
  * config file's relevant lines carry over unedited. */
case class GraftConfig(
    namespaceRegex: Option[String] = None,           // namespace-regex (monstache.go:341)
    namespaceExcludeRegex: Option[String] = None,     // namespace-exclude-regex
    namespaceDropRegex: Option[String] = None,        // namespace-drop-regex
    namespaceDropExcludeRegex: Option[String] = None, // namespace-drop-exclude-regex
    configDb: String = "monstache",                   // config-database-name
    deleteStrategy: Int = 0,                          // delete-strategy (117-123)
    indexAsUpdate: Boolean = false,                   // index-as-update
    indexOplogTime: Boolean = false,                  // index-oplog-time (373)
    oplogTsFieldName: String = "oplog_ts",            // oplog-ts-field-name
    oplogDateFieldName: String = "oplog_date",        // oplog-date-field-name
    oplogDateFieldFormat: String = "2006/01/02 15:04:05", // Go layout (2882-2890)
    patchNamespaces: Seq[String] = Nil,               // patch-namespaces (395)
    timeMachineNamespaces: Seq[String] = Nil,         // time-machine-namespaces (410)
    timeMachineIndexPrefix: String = "log",           // time-machine-index-prefix (411)
    timeMachineIndexSuffix: String = "2006-01-02",    // time-machine-index-suffix (412; a Go date layout)
    directReadNamespaces: Seq[String] = Nil,          // direct-read-namespaces (399)
    directReadDynamicIncludeRegex: Option[String] = None, // direct-read-dynamic-include-regex (406)
    directReadDynamicExcludeRegex: Option[String] = None, // direct-read-dynamic-exclude-regex (405)
    relates: Seq[Relation] = Nil,                     // [[relate]] (206-217)
    mappings: Map[String, String] = Map.empty,        // [[mapping]] (indexMapping)
    indexFiles: Boolean = false,                      // index-files (monstache.go:367)
    fileNamespaces: Seq[String] = Nil,                // file-namespaces (394)
    maxFileSize: Long = 0,                            // max-file-size (387; 0 = no cap)
    stats: Boolean = false,                           // stats (1798)
    indexStats: Boolean = false,                      // index-stats (354)
    statsDuration: Option[String] = None,             // stats-duration (355; a Go duration)
    statsIndexFormat: String = "monstache.stats.2006-01-02", // stats-index-format (356; a Go layout, default 2858-2860)
    pruneInvalidJson: Boolean = false,                // prune-invalid-json (423)
    droppedDatabases: Boolean = true,                 // dropped-databases (365; default true, 2139)
    droppedCollections: Boolean = true,               // dropped-collections (366)
    disableDeleteProtection: Boolean = false,         // disable-delete-protection (351)
    routingNamespaces: Seq[String] = Nil,             // routing-namespaces (415)
    curation: CurationConfig = CurationConfig()) {    // [curation] (extension surface)

  def namespaceFilter: NamespaceFilterConfig =
    NamespaceFilterConfig(namespaceRegex, namespaceExcludeRegex,
      namespaceDropRegex, namespaceDropExcludeRegex, configDb)

  /** The oplog-date format translated from the reference's Go layout. */
  def oplogDateJvmFormat: String = Codecs.goLayoutToJvm(oplogDateFieldFormat)
}

/** The `[curation]` table — the LLM-curation pipeline's TOML surface
  * (extension, no reference analog: monstache has no curation stage).
  * Selected at the daemon by `--pipeline curation`; the envelope maps to
  * curation documents as doc_id = CAST(envelope id AS BIGINT), text =
  * the `text-field` JSON field of the document body, source = the
  * envelope's collection name. */
case class CurationConfig(
    numBuckets: Int = 64,      // num-buckets  (bucketed-state fan-out)
    lineMinChars: Int = 10,    // line-min-chars (line-census threshold)
    textField: String = "text") // text-field  (JSON field carrying text)

object GraftConfig {

  /** A required, type-checked string key inside an `[[table]]` entry —
    * missing or mistyped keys name the table and key, not a bare
    * NoSuchElementException. */
  private def req(t: Map[String, Any], table: String, key: String): String =
    t.get(key) match {
      case Some(v) => Toml.Doc.str(s"$table.$key", v)
      case None => throw new IllegalArgumentException(
        s"config: every [[${table}]] entry needs `$key`")
    }

  def fromToml(text: String): GraftConfig = {
    val doc = Toml.parse(text)
    // `[mapping]` / `[relate]` (single-bracket TABLES) are the classic
    // typo for the `[[...]]` array-of-tables the reference documents —
    // Toml.parse files them under tables, the array lookups below would
    // see nothing, and every doc would silently route to the default
    // index. Reject loudly instead.
    Seq("mapping", "relate").foreach { k =>
      require(!doc.tables.contains(k),
        s"config: [$k] is a table — use an [[${k}]] array-of-tables entry")
    }
    val base = GraftConfig()
    GraftConfig(
      namespaceRegex = doc.str("namespace-regex"),
      namespaceExcludeRegex = doc.str("namespace-exclude-regex"),
      namespaceDropRegex = doc.str("namespace-drop-regex"),
      namespaceDropExcludeRegex = doc.str("namespace-drop-exclude-regex"),
      configDb = doc.str("config-database-name").getOrElse(base.configDb),
      deleteStrategy = {
        val s = doc.int("delete-strategy", base.deleteStrategy)
        // the reference's doDelete switch silently applies NO deletes for
        // an unknown value (monstache.go delete routing) — a typo'd
        // strategy must be a loud config error here, not a silent
        // behavior fork between the engines
        require(s >= 0 && s <= 2,
          s"config: delete-strategy must be 0 (stateless), 1 (stateful) " +
            s"or 2 (ignore); got $s")
        s
      },
      indexAsUpdate = doc.bool("index-as-update"),
      indexOplogTime = doc.bool("index-oplog-time"),
      oplogTsFieldName =
        doc.str("oplog-ts-field-name").getOrElse(base.oplogTsFieldName),
      oplogDateFieldName =
        doc.str("oplog-date-field-name").getOrElse(base.oplogDateFieldName),
      oplogDateFieldFormat =
        doc.str("oplog-date-field-format").getOrElse(base.oplogDateFieldFormat),
      patchNamespaces = doc.strings("patch-namespaces"),
      timeMachineNamespaces = doc.strings("time-machine-namespaces"),
      timeMachineIndexPrefix =
        doc.str("time-machine-index-prefix").getOrElse(base.timeMachineIndexPrefix),
      timeMachineIndexSuffix =
        doc.str("time-machine-index-suffix").getOrElse(base.timeMachineIndexSuffix),
      directReadNamespaces = doc.strings("direct-read-namespaces"),
      directReadDynamicIncludeRegex = doc.str("direct-read-dynamic-include-regex"),
      directReadDynamicExcludeRegex = doc.str("direct-read-dynamic-exclude-regex"),
      relates = doc.arrays.getOrElse("relate", Nil).map { t =>
        Relation(
          namespace = req(t, "relate", "namespace"),
          withNamespace = req(t, "relate", "with-namespace"),
          srcField = req(t, "relate", "src-field"),
          matchField = req(t, "relate", "match-field"),
          keepSrc = t.get("keep-src").exists {
            case b: Boolean => b
            case other => Toml.Doc.mismatch("relate.keep-src", "boolean", other)
          },
          maxDepth = t.get("max-depth").map {
            case n: Long =>
              try Math.toIntExact(n)
              catch { case _: ArithmeticException =>
                Toml.Doc.mismatch("relate.max-depth", "32-bit integer", n)
              }
            case other => Toml.Doc.mismatch("relate.max-depth", "integer", other)
          }.getOrElse(0),
          matchFieldType =
            t.get("match-field-type").map(Toml.Doc.str("relate.match-field-type", _)))
      },
      mappings = doc.arrays.getOrElse("mapping", Nil)
        .map(t => req(t, "mapping", "namespace") -> req(t, "mapping", "index"))
        .toMap,
      indexFiles = doc.bool("index-files"),
      fileNamespaces = doc.strings("file-namespaces"),
      maxFileSize = doc.long("max-file-size"),
      stats = doc.bool("stats"),
      indexStats = doc.bool("index-stats"),
      statsDuration = doc.str("stats-duration"),
      statsIndexFormat =
        doc.str("stats-index-format").getOrElse(base.statsIndexFormat),
      pruneInvalidJson = doc.bool("prune-invalid-json"),
      droppedDatabases = doc.bool("dropped-databases", default = true),
      droppedCollections = doc.bool("dropped-collections", default = true),
      disableDeleteProtection = doc.bool("disable-delete-protection"),
      routingNamespaces = doc.strings("routing-namespaces"),
      curation = doc.tables.get("curation").map { t =>
        def tInt(key: String, default: Int): Int = t.get(key) match {
          case None => default
          case Some(n: Long) =>
            try Math.toIntExact(n)
            catch { case _: ArithmeticException =>
              Toml.Doc.mismatch(s"curation.$key", "32-bit integer", n)
            }
          case Some(other) =>
            Toml.Doc.mismatch(s"curation.$key", "integer", other)
        }
        val cc = CurationConfig(
          numBuckets = tInt("num-buckets", CurationConfig().numBuckets),
          lineMinChars =
            tInt("line-min-chars", CurationConfig().lineMinChars),
          textField = t.get("text-field")
            .map(Toml.Doc.str("curation.text-field", _))
            .getOrElse(CurationConfig().textField))
        require(cc.numBuckets > 0,
          s"config: curation.num-buckets must be positive, got ${cc.numBuckets}")
        cc
      }.getOrElse(CurationConfig()))
  }

  def load(path: String): GraftConfig =
    fromToml(Files.readString(Paths.get(path)))

  /** Load a classpath resource (the checked-in fixture config travels
    * with the jar, so entry points work regardless of working dir). */
  def loadResource(name: String): GraftConfig = {
    val in = getClass.getResourceAsStream(name)
    require(in != null, s"config resource not found: $name")
    try fromToml(new String(in.readAllBytes(), StandardCharsets.UTF_8))
    finally in.close()
  }
}

/** Assembles the hot path (SURVEY §3.1) from a [[GraftConfig]] — the
  * config-file front door a reference user programs against: filters,
  * oplog-time injection, index mappings, and delete strategy come from
  * the file; per-namespace transforms stay a code registry (the
  * reference's JS/plugin scripts are code selected by config too). */
object ConfiguredPipeline {

  /** envelope → F1-F4 chain → registry (F5/F6, P1-P3, P11) → P5 oplog
    * date/ts injection → K7/P3/P4 routing metadata. */
  def hotPath(cfg: GraftConfig,
              registry: TransformRegistry = TransformRegistry(),
              quarantine: Boolean = false)(
              df: DataFrame): DataFrame = {
    val filtered = NamespaceFilter(df, cfg.namespaceFilter)
    // prune-invalid-json runs BEFORE the mappers, like the reference's
    // fixPruneInvalidJSON ahead of script/plugin dispatch
    // (monstache.go:1370-1374): transforms see the already-sanitized doc
    val pruned =
      if (!cfg.pruneInvalidJson) filtered
      else filtered.withColumn("document",
        graft.codec.PruneInvalidJson.pruneCol(col("document")))
    val mapped = registry(pruned)
    val stamped =
      if (!cfg.indexOplogTime) mapped
      else mapped
        .withColumn(cfg.oplogTsFieldName, col("ts_us"))
        .withColumn(cfg.oplogDateFieldName,
          date_format(timestamp_micros(col("ts_us")), cfg.oplogDateJvmFormat))
    Routing.withMeta(stamped, cfg.mappings, quarantine = quarantine)
  }

  /** The "what the index holds" batch answer: hot path + last-writer-wins
    * + the configured delete strategy's view (strategy 2 = ignore keeps
    * tombstoned docs' final data op, 0/1 drop deleted keys from the live
    * view — DeleteStrategies holds the full routed forms).
    *
    * `index-as-update = true` (K1 doc-as-upsert, monstache.go:3203-3215)
    * switches whole-doc overwrite to per-field merge — `mergeFields`
    * names the columns whose latest non-null value survives partial
    * updates (the columnar analog of the reference merging into the
    * stored ES doc). The config key without the field list is a loud
    * error, never a silent fall-through to overwrite semantics. */
  def indexedDocuments(cfg: GraftConfig,
                       registry: TransformRegistry = TransformRegistry(),
                       mergeFields: Seq[String] = Nil)(
                       df: DataFrame): DataFrame = {
    val ops =
      if (cfg.deleteStrategy == 2) DeleteStrategies.ignore(df) else df
    val hot = hotPath(cfg, registry)(ops)
    if (!cfg.indexAsUpdate) Upsert.liveDocuments(hot)
    else {
      require(mergeFields.nonEmpty,
        "config: index-as-update = true needs mergeFields — the columns " +
          "whose latest non-null value merges across partial updates")
      // doc-as-upsert indexing does not suspend deletes: the reference
      // routes deletes through doDelete regardless of indexing mode, so
      // a key whose FINAL op is a delete leaves the index here too
      // (under strategy 2 the deletes were filtered above — tombstones
      // is then empty and the anti-join a no-op)
      val keys = Upsert.identityCols(hot)
      Upsert.indexAsUpdate(hot, mergeFields)
        .join(Upsert.tombstones(hot).select(keys.map(col): _*), keys, "left_anti")
    }
  }

  /** The reference's actual runtime shape (SURVEY §3.1: a continuous
    * daemon driven by its TOML file), assembled from config: the same
    * [[hotPath]], run as a stream into LWW-merged durable state with
    * checkpoint/resume. Pair with
    * [[graft.streaming.StreamingUpsert.seedState]] (over a
    * [[hotPath]]-transformed [[directRead]] snapshot) for the full
    * initial-sync → tail lifecycle. The default trigger drains available
    * input and stops (backfills, scheduled syncs, tests); the
    * always-on daemon passes `Trigger.ProcessingTime(...)`. */
  def startStream(cfg: GraftConfig,
                  registry: TransformRegistry = TransformRegistry())(
                  events: DataFrame, stateDir: String, checkpointDir: String,
                  trigger: org.apache.spark.sql.streaming.Trigger =
                    org.apache.spark.sql.streaming.Trigger.AvailableNow(),
                  mergeFields: Seq[String] = Nil)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val transform: DataFrame => DataFrame = df =>
      hotPath(cfg, registry)(
        if (cfg.deleteStrategy == 2) DeleteStrategies.ignore(df) else df)
    if (cfg.indexAsUpdate) {
      // doc-as-upsert streams through the per-field partial-state merge;
      // the config key without the field list is the same loud error as
      // the batch path — never a silent fall-through to overwrite LWW
      require(mergeFields.nonEmpty,
        "config: index-as-update = true needs mergeFields — the columns " +
          "whose latest non-null value merges across partial updates")
      graft.streaming.StreamingIndexAsUpdate.start(events, stateDir,
        checkpointDir, fields = mergeFields, transform = transform,
        trigger = trigger)
    } else
      graft.streaming.StreamingUpsert.start(events, stateDir, checkpointDir,
        transform = transform, trigger = trigger)
  }

  /** The full config-driven SINK lifecycle: the same [[hotPath]], run as
    * a stream into a pluggable [[graft.sink.SinkBackend]] — the
    * reference's daemon shape with a real (or mock) store on the other
    * end instead of the state-dir stand-in. Every config knob the writer
    * honors (delete strategy + protection, drop gates, time-machine
    * namespaces, index mappings) comes from `cfg`; see
    * [[graft.sink.SinkWriter]] for the per-batch op routing. */
  def startSink(cfg: GraftConfig,
                registry: TransformRegistry = TransformRegistry())(
                events: DataFrame, checkpointDir: String,
                backend: graft.sink.SinkBackend,
                trigger: org.apache.spark.sql.streaming.Trigger =
                  org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    graft.sink.SinkWriter.start(events, checkpointDir, cfg, backend,
      transform = hotPath(cfg, registry), trigger = trigger)

  /** The reference's FULL routeData topology (monstache.go:3464-3477),
    * assembled from config: ops of namespaces with `[[relate]]` entries
    * fan out breadth-first over `collections` — join-only unless some
    * relation keeps the source (routeDataRelate, monstache.go:3419-3462)
    * — each related doc re-emitted as a synthetic direct-query op
    * stamped from its trigger (1289-1298); file-namespace ops pick up
    * base64 content folded INTO the document (addFileContent,
    * 1405-1433); and everything lands on the [[hotPath]] toward the
    * sink. Deletes on a no-keep-src relate source are dropped entirely,
    * exactly `skipDelete` (3358-3369): a delete's document is null, so
    * its src key extracts null and joins nothing, and its own doc was
    * never indexed — identity-relation cascades are the separate J2
    * surface ([[graft.operators.DeleteStrategies.recoverAndPropagate]]).
    *
    * `collections`: namespace → doc-shaped frame carrying at least
    * (id, document) plus each inbound relation's match field (and the
    * file content column for file namespaces). Collection column names
    * must not collide with the carried trigger stamps
    * (event_id/operation/ts_us/version).
    *
    * Scale: one equi-join per relation hop (per-relation broadcast
    * opt-in, AQE otherwise), a union, then the codegen'd hot path — the
    * driver-side loop is bounded by the relation graph, never the data.
    * Works unchanged over a streaming `events` frame (stream-static
    * joins), which is what [[startRoutedSink]] runs. */
  def routeData(cfg: GraftConfig,
                registry: TransformRegistry = TransformRegistry(),
                collections: Map[String, DataFrame] = Map.empty,
                fileContentCol: String = "file_content")(
                events: DataFrame): DataFrame = {
    val relNs = cfg.relates.map(_.namespace).distinct
    // a relation whose with-namespace has no collection frame would make
    // fanOut silently skip the hop — its join-only source ops vanish
    // without a trace; the reference can always query the collection, so
    // a missing frame here is a wiring error, not a data condition
    val missing = cfg.relates.map(_.withNamespace).distinct
      .filterNot(collections.contains)
    require(cfg.relates.isEmpty || missing.isEmpty,
      s"routeData: [[relate]] with-namespace ${missing.mkString(", ")} " +
        "missing from `collections` — relate-source ops would be " +
        "silently dropped")
    val routed =
      if (cfg.relates.isEmpty) events
      else {
        val seeds = relNs.map(ns =>
          ns -> events.filter(col("namespace") === ns)).toMap
        val fanned = Relate.fanOut(events.sparkSession, seeds, collections,
          cfg.relates, carry = Seq("event_id", "operation", "ts_us", "version"))
        val direct = events.filter(!col("namespace").isin(relNs: _*))
        // a fully-cyclic join-only graph emits nothing: fanOut returns
        // the zero-column empty frame, and only the direct ops index
        if (!fanned.columns.contains("rel_depth")) direct
        else {
          // depth 0 = keep-src seeds: already envelope-shaped ops
          val keptSrc = fanned.filter(col("rel_depth") === 0)
            .drop("rel_namespace", "rel_depth")
          // depth ≥ 1 = synthetic ops: related docs stamped from their
          // trigger's carried columns, sourced direct_query (1289-1298)
          val synthetic = fanned.filter(col("rel_depth") > 0)
            .withColumn("namespace", col("rel_namespace"))
            .withColumn("db", substring_index(col("rel_namespace"), ".", 1))
            .withColumn("coll", expr("substring(namespace, length(db) + 2)"))
            .withColumn("source", lit("direct_query"))
            .drop("rel_namespace", "rel_depth")
          direct
            .unionByName(keptSrc, allowMissingColumns = true)
            .unionByName(synthetic, allowMissingColumns = true)
        }
      }
    // loud wiring check, same contract as the missing-collection require
    // above: with index-files on, content can only ride in on a column
    // of the routed frame (the events envelope itself, or carried
    // through relate collection frames). Without it, attach's
    // octet_length(col) would die as an unresolved-column
    // AnalysisException deep inside plan analysis — with empty relates
    // or a fully-cyclic join-only graph being the configurations that
    // hit it — instead of naming the actual misconfiguration.
    if (cfg.indexFiles)
      require(routed.columns.contains(fileContentCol),
        s"routeData: index-files = true but the routed frame has no " +
          s"'$fileContentCol' column — file content must be a column of " +
          "the events frame or of a relate collection frame (or disable " +
          "index-files)")
    // advisory oversize tag BEFORE attach (the reference logs the skip,
    // monstache.go:1425-1429), then the hot path in quarantine mode so
    // id rejects reach writeBatch TAGGED instead of silently filtered —
    // the sink boundary is where the errors channel lives
    val tagged =
      if (cfg.indexFiles) FileContent.tagSkips(routed, fileContentCol,
        cfg.maxFileSize, cfg.fileNamespaces)
      else routed
    val withFiles = FileContent.foldIntoDocument(
      attachFiles(cfg)(tagged, fileContentCol))
    hotPath(cfg, registry, quarantine = true)(withFiles)
  }

  /** [[routeData]] run continuously into a pluggable sink — the
    * reference's complete daemon shape: change stream → relate fan-out →
    * file content → filters/transforms/routing → the K-layer writer
    * (routeOp → routeData → doIndexing, monstache.go:3481-3495). */
  def startRoutedSink(cfg: GraftConfig,
                      registry: TransformRegistry = TransformRegistry(),
                      collections: Map[String, DataFrame] = Map.empty,
                      fileContentCol: String = "file_content")(
                      events: DataFrame, checkpointDir: String,
                      backend: graft.sink.SinkBackend,
                      trigger: org.apache.spark.sql.streaming.Trigger =
                        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    graft.sink.SinkWriter.start(events, checkpointDir, cfg, backend,
      transform = routeData(cfg, registry, collections, fileContentCol),
      trigger = trigger)

  /** J1-J3 from `[[relate]]` config: the BFS fan-out over the configured
    * relation graph (seeds/collections keyed by namespace). */
  def relateFanOut(cfg: GraftConfig,
                   spark: org.apache.spark.sql.SparkSession,
                   seeds: Map[String, DataFrame],
                   collections: Map[String, DataFrame]): DataFrame =
    Relate.fanOut(spark, seeds, collections, cfg.relates)

  /** P10 from `patch-namespaces`: the batch patch-pair frame (see
    * [[graft.streaming.StreamingPatchLog]] for the continuous form). */
  def patchPairs(cfg: GraftConfig)(df: DataFrame): DataFrame =
    PatchLog.pairs(df, cfg.patchNamespaces)

  /** K4 from `time-machine-namespaces`: the dated history projection,
    * named per the configured prefix + Go-layout suffix. */
  def history(cfg: GraftConfig)(df: DataFrame): DataFrame =
    TimeMachine.history(df, cfg.timeMachineNamespaces,
      cfg.timeMachineIndexPrefix, cfg.timeMachineIndexSuffix)

  /** S7 from `index-files` + `file-namespaces` + `max-file-size`: attach
    * base64 file content to ops from the configured file-namespaces,
    * subject to the size cap (`addFileContent` monstache.go:1405-1433).
    * With `index-files = false` (the reference default) the frame passes
    * through untouched — no `file` column, no content reads. */
  def attachFiles(cfg: GraftConfig)(df: DataFrame,
                                    contentCol: String): DataFrame =
    if (!cfg.indexFiles) df
    else FileContent.attach(df, contentCol, cfg.maxFileSize,
      cfg.fileNamespaces)

  /** A3/K5 from `stats` / `index-stats`: the per-(namespace, operation)
    * flush-stats frame — None when stats are off; the dated
    * `monstache.stats.<date>` index name only under `index-stats = true`
    * (plain `stats` just logs, monstache.go:3510-3527 vs 4959-4972). */
  def bulkStats(cfg: GraftConfig)(df: DataFrame): Option[DataFrame] =
    if (!cfg.stats && !cfg.indexStats) None
    else Some(Stats.bulkStats(df, dated = cfg.indexStats,
      statsIndexFormat = cfg.statsIndexFormat))

  /** K3 from `dropped-databases` / `dropped-collections`: the per-index
    * drop-survival report with a disabled drop kind treated as no-ops
    * (`doDrop` monstache.go:3056-3075 skips the delete when unset). */
  def indexSurvival(cfg: GraftConfig)(ops: DataFrame): DataFrame =
    DropPropagation.indexSurvival(ops,
      droppedDatabases = cfg.droppedDatabases,
      droppedCollections = cfg.droppedCollections)

  /** K2 stateless deletes from `routing-namespaces` +
    * `disable-delete-protection` (monstache.go:4082-4147): namespaces
    * with routing overrides (or the `""` = all convention) resolve
    * against sink state — exactly-one protected, or delete-by-query when
    * protection is disabled; everything else deletes directly at the
    * default-resolved index with the doc id as routing. */
  def statelessDeletes(cfg: GraftConfig)(deletes: DataFrame,
                                         sinkState: DataFrame): DataFrame = {
    val routedPred =
      if (cfg.routingNamespaces.contains("")) lit(true)
      else if (cfg.routingNamespaces.isEmpty) lit(false)
      // coalesce: a NULL namespace makes isin() NULL, and NULL fails BOTH
      // filter(p) and filter(!p) — the delete would vanish from the
      // report entirely; it must fall through to the direct branch
      else coalesce(col("namespace").isin(cfg.routingNamespaces: _*),
        lit(false))
    val routed = DeleteStrategies.statelessRouted(
      deletes.filter(routedPred), sinkState,
      deleteProtection = !cfg.disableDeleteProtection)
    val direct = deletes.filter(!routedPred)
      .withColumn("n_hits", lit(1L))
      .withColumn("status", lit("deleted"))
      .withColumn("hit_index", Routing.resolveIndex(cfg.mappings))
      .withColumn("hit_routing", col("id"))
    routed.unionByName(direct)
  }

  /** The `stats-duration` cadence as a streaming trigger (the reference
    * flushes stats on this timer, monstache.go:5019-5101): a Go duration
    * → ProcessingTime; unset → drain-and-stop like every other default
    * trigger here. */
  def statsTrigger(cfg: GraftConfig): org.apache.spark.sql.streaming.Trigger =
    cfg.statsDuration match {
      case Some(d) =>
        val ms = Codecs.goDurationToMillis(d)
        // a zero cadence would make Spark run micro-batches back-to-back
        // (a silent busy-spin); the reference's ticker panics on 0
        require(ms > 0,
          s"config: stats-duration '$d' resolves to a zero cadence")
        org.apache.spark.sql.streaming.Trigger.ProcessingTime(ms)
      case None => org.apache.spark.sql.streaming.Trigger.AvailableNow()
    }

  /** S3/S4/F8 from `direct-read-namespaces`: the configured namespaces
    * read directly, or — with the reference's explicit `[""]` convention
    * (buildDynamicDirectReadNs, monstache.go:4783-4825) — dynamic
    * discovery filtered by the dynamic include/exclude regex pair. A
    * config that OMITS the key configures no direct reads at all
    * (change-stream-only, exactly the reference's default) — it must
    * never fall through to scan-everything discovery. */
  def directRead(cfg: GraftConfig,
                 spark: org.apache.spark.sql.SparkSession,
                 dir: String): DataFrame = {
    val nss =
      if (cfg.directReadNamespaces.isEmpty) Nil
      else if (cfg.directReadNamespaces.forall(_.isEmpty))
        graft.source.Discovery.filterNamespaces(
          graft.source.Discovery.listCollections(spark, dir),
          cfg.directReadDynamicIncludeRegex,
          cfg.directReadDynamicExcludeRegex,
          configDb = cfg.configDb)
      else cfg.directReadNamespaces
    // FULL envelopes (not the namespace summary): the config front
    // door's backfill must flow through hotPath/seedState unchanged.
    // The no-namespace case delegates too — Discovery returns the
    // envelope-SCHEMA empty frame, where a bare spark.emptyDataFrame
    // (zero columns) would blow up the first downstream col() reference
    graft.source.Discovery.directReadEnvelopes(spark, dir, nss)
  }
}
