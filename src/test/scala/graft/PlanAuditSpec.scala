package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Upsert
import graft.source.EventLog

/** Physical-plan shape guards: the properties that make the operators
  * survive 100× scale must be visible in the plan, not just hoped for —
  * filter/projection pushdown to the parquet scan (A1), broadcast on
  * dimension joins, and map-side partial aggregation for LWW. A
  * regression that silently loses one of these fails here, not in a
  * cluster. */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def fmt(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("filter and projection reach the parquet scan (A1 pushdown)") {
    val df = spark.read.parquet(s"$dir/events.parquet")
      .filter(col("user_id") < 100).select("event_id", "user_id")
    val plan = fmt(df)
    assert(plan.contains("LessThan(user_id,100)"), s"filter not pushed:\n$plan")
    // column pruning: the wide props/ts columns must not be read
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("props") && !readSchema.contains("event_type"),
      s"scan not pruned: $readSchema")
  }

  test("the envelope's namespace filter pushes to the events scan") {
    val df = EventLog.envelope(spark, dir).filter(col("value") > 99.5)
    assert(fmt(df).contains("GreaterThan(value,99.5)"))
  }

  test("pipeline registry $match/$project reach the scan (A1 pushdown)") {
    val reg = graft.operators.PipelineRegistry(Map(
      "app.events" -> ((_, _) => Seq(
        df => df.filter(col("user_id") < 100),
        df => df.select("event_id", "user_id")))))
    val plan = fmt(reg(spark.read.parquet(s"$dir/events.parquet"),
      "app.events", changeEvent = true))
    assert(plan.contains("LessThan(user_id,100)"), s"stage not pushed:\n$plan")
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("props"), s"stage did not prune: $readSchema")
  }

  test("relate chain broadcasts its dimension tables") {
    val plan = fmt(SparkEntry.queries("q21_relate_chain")(spark, dir))
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
  }

  test("line dedup broadcasts the boilerplate set and plans no window") {
    val plan = fmt(SparkEntry.benchQueries("q81_line_dedup")(spark, dir))
    assert(plan.contains("BroadcastHashJoin"),
      s"boilerplate-set join not broadcast:\n$plan")
    assert(!plan.contains("Window"), "line dedup must not plan a window")
    assert(plan.contains("partial_collect_list"),
      s"reassembly lost its map-side partial agg:\n$plan")
  }

  test("LWW shows partial max_by before the key shuffle (no window sort)") {
    val plan = fmt(Upsert.lastWriterWins(EventLog.envelope(spark, dir)))
    assert(plan.contains("partial_max_by"), s"no partial agg:\n$plan")
    assert(!plan.contains("Window"), "LWW must not plan a window")
  }

  test("ANN plans never rank through a window (bounded-heap top-k only)") {
    // the round-3 scale-killer: row_number windows shuffled every scored
    // candidate (with vector payloads) into |queries| partitions. The
    // rework must stay window-free — top-k is a partial-aggregated
    // ObjectHashAggregate, assignment is a narrow projection.
    for (q <- Seq("q34_ann_bruteforce", "q35_ann_ivf", "q45_embedding_neardup")) {
      val plan = SparkEntry.benchQueries(q)(spark, dir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Window"), s"$q ranks via a window again:\n$plan")
    }
    val topk = fmt(SparkEntry.benchQueries("q35_ann_ivf")(spark, dir))
    assert(topk.contains("ObjectHashAggregate") || topk.contains("SortAggregate"),
      s"q35 top-k is not an aggregation:\n$topk")
  }

  test("IVF assignment is narrow: no shuffle between scan and bucket") {
    // map-side argmax against broadcast centroids — the assignment
    // subtree must contain no Exchange (the only exchanges in the full
    // ivfAssign plan belong to the input spread/repartition, which this
    // bare call does not include)
    val assigned = graft.llm.Similarity.ivfAssign(
      spark.read.parquet(s"$dir/embeddings.parquet"),
      centroidPred = col("vec_id") % 50 === 0)
    val plan = assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"IVF assignment shuffles:\n$plan")
  }

  test("bucket-partitioned IVF index prunes unprobed buckets at the scan") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivf-index").toString
    val assigned = graft.llm.Similarity.ivfAssign(
      spark.read.parquet(s"$dir/embeddings.parquet"),
      centroidPred = col("vec_id") % 50 === 0)
    graft.llm.Similarity.writeIndex(assigned, tmp)
    val probed = graft.llm.Similarity.readIndex(spark, tmp, Seq(0L, 50L))
    val plan = fmt(probed)
    // the probe must be a partition filter (directory pruning), not a
    // post-scan data filter over every bucket
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"probe did not reach PartitionFilters:\n$plan")
    val expected = assigned.filter(col("bucket").isin(0L, 50L)).count()
    assert(probed.count() == expected && expected > 0)
  }

  test("label-centroid outliers broadcast the centroid table, partial-agg the sums") {
    val plan = fmt(SparkEntry.benchQueries("q95_label_outliers")(spark, dir))
    assert(plan.contains("BroadcastHashJoin"),
      s"centroid join not broadcast:\n$plan")
    assert(plan.contains("partial_sum"),
      s"centroid sums lost their map-side partial agg:\n$plan")
  }

  test("bloom decontamination carries its gram prefilter in-plan") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val eval = docs.filter(col("doc_id") % 11 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val plan = fmt(graft.llm.Dedup.exactNgramContaminationBloom(docs, eval))
    // the native membership probe must survive into the physical plan
    // (it feeds the join input; Catalyst can push it down but never
    // lift it above the join) WITHOUT a codegen-fencing UDF, and the
    // confirm join must broadcast the benchmark-sized eval side
    assert(plan.contains("graft_bloom_hit"),
      s"bloom prefilter not in plan:\n$plan")
    assert(!plan.contains("UDF"), s"bloom probe fell back to a UDF:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"confirm join not broadcast:\n$plan")
  }

  test("PQ encode is narrow: no shuffle between scan and codes") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val cb = graft.llm.Pq.train(e, col("vec_id") % 64 === 0,
      dim = 64, m = 8, iters = 1)
    val plan = graft.llm.Pq.encode(e, cb)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"PQ encode shuffles:\n$plan")
  }

  test("persisted IVF-PQ index prunes unprobed buckets at the scan") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-pq-plan").toString
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val coarse = graft.llm.Similarity.collectCentroids(
      e.filter(col("vec_id") % 64 === 0))
    val cb = graft.llm.Pq.trainResidual(e, coarse,
      col("vec_id") % 40 === 0, dim = 64, m = 8, iters = 1)
    graft.llm.Pq.writeIndex(e, coarse, cb, tmp)
    val probed = graft.llm.Pq.ivfAdcTopKFromIndex(
      e.filter(col("vec_id") % 100 === 0), tmp, k = 3, nprobe = 2)
    val plan = fmt(probed)
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"PQ probe did not reach PartitionFilters:\n$plan")
    assert(probed.count() > 0)
  }

  test("sessionization: lag + running sum ride ONE exchange and ONE sort") {
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val plan = fmt(graft.operators.Sessionize.withSessions(ev,
      gapUs = 1800000000L, tsUs = EventLog.tsUsOf(ev)))
    // Spark stacks the two frames as two Window NODES, but both consume
    // the same user-keyed exchange + (user, ts, tie) sort — the scale
    // claim is the single shuffle/sort, which this pins
    def nodes(name: String) =
      plan.linesIterator.count(_.matches(s"""^\\(\\d+\\) $name.*"""))
    assert(nodes("Exchange") === 1,
      s"expected one exchange, got ${nodes("Exchange")}:\n$plan")
    assert(nodes("Sort") === 1,
      s"expected one sort, got ${nodes("Sort")}:\n$plan")
  }

  test("as-of join plans ZERO joins: one union exchange, one sort") {
    val plan = fmt(SparkEntry.benchQueries("q201_asof_join")(spark, dir))
    // the whole point vs `l JOIN r ON key AND r.ts <= l.ts`: no join
    // node anywhere (no hot-key explosion to prune), both sides union
    // into ONE key exchange and ONE (ts, side, tie) sort
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    def nodes(name: String) =
      plan.linesIterator.count(_.matches(s"""^\\(\\d+\\) $name.*"""))
    assert(nodes("Exchange") === 1,
      s"expected one exchange, got ${nodes("Exchange")}:\n$plan")
    assert(nodes("Sort") === 1,
      s"expected one sort, got ${nodes("Sort")}:\n$plan")
    assert(nodes("Window") <= 2, // running match + (guard slot unused)
      s"expected at most two window nodes:\n$plan")
  }

  test("interval join plans an EQUI join on the grid, never a nested loop") {
    val plan = fmt(SparkEntry.benchQueries("q203_interval_attribution")(
      spark, dir))
    // the raw `ts BETWEEN s AND e` predicate would plan a broadcast
    // nested loop (quadratic the moment neither side broadcasts); the
    // grid discretization must keep it a hash/merge join
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"interval join degenerated to a nested loop:\n$plan")
    assert(plan.contains("Join"), s"expected an equi join:\n$plan")
  }

  test("rolling features stack every frame on ONE exchange and ONE sort") {
    val plan = fmt(SparkEntry.benchQueries("q204_rolling_features")(
      spark, dir))
    def nodes(name: String) =
      plan.linesIterator.count(_.matches(s"""^\\(\\d+\\) $name.*"""))
    // the lag window's (user, ts, tie) sort satisfies every RANGE
    // frame's (user, ts) prefix — 5 features, one shuffle, one sort
    assert(nodes("Exchange") === 1,
      s"expected one exchange, got ${nodes("Exchange")}:\n$plan")
    assert(nodes("Sort") === 1,
      s"expected one sort, got ${nodes("Sort")}:\n$plan")
  }

  test("SCD2 build rides one exchange: the start filter keeps the lead in-place") {
    val plan = fmt(SparkEntry.benchQueries("q205_scd2_intervals")(spark, dir))
    def nodes(name: String) =
      plan.linesIterator.count(_.matches(s"""^\\(\\d+\\) $name.*"""))
    assert(nodes("Exchange") === 1,
      s"expected one exchange, got ${nodes("Exchange")}:\n$plan")
  }

  test("the training-example assembly plans ZERO joins (three window passes)") {
    val plan = fmt(SparkEntry.benchQueries("q210_training_examples")(
      spark, dir))
    assert(!plan.contains("Join"),
      s"the composite must chain through as-of, never join:\n$plan")
  }

  test("HTML extraction is purely narrow: no exchange, no join") {
    import spark.implicits._
    val df = graft.llm.Extract.htmlExtract(
      Seq((1L, "<p>some html body text here</p>")).toDF("doc_id", "html"))
    val plan = fmt(df)
    assert(!plan.contains("Exchange"), s"extraction shuffled:\n$plan")
    assert(!plan.contains("Join"), s"extraction joined:\n$plan")
  }

  test("PSL domain reduction is narrow: literal rules, no join, no shuffle") {
    import spark.implicits._
    val df = graft.llm.UrlOps.withDomain(graft.llm.UrlOps.withUrlParts(
      Seq((1L, "https://www.example.co.uk/p")).toDF("doc_id", "url")))
    val plan = fmt(df)
    assert(!plan.contains("Exchange"), s"PSL lookup shuffled:\n$plan")
    assert(!plan.contains("Join"), s"PSL lookup joined:\n$plan")
  }

  test("skip-gram mining plans ZERO joins; the pair window rides the user exchange") {
    val plan = fmt(SparkEntry.benchQueries("q213_skipgram_pairs")(
      spark, dir))
    assert(!plan.contains("Join"),
      s"skip-gram must stack lead() frames, never self-join:\n$plan")
    def nodes(name: String) =
      plan.linesIterator.count(_.matches(s"""^\\(\\d+\\) $name.*"""))
    // user exchange (windows) + census partial→final exchange
    assert(nodes("Exchange") <= 2,
      s"expected at most two exchanges, got ${nodes("Exchange")}:\n$plan")
  }

  test("exact-k sampling is a bounded heap, never a window sort") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val plan = fmt(graft.llm.Sampling.exactKPerStratum(docs, 7, "source"))
    assert(!plan.contains("Window"),
      s"exact-k must not rank through a window:\n$plan")
    assert(plan.contains("ObjectHashAggregate") &&
      plan.contains("partial_keepksmallest"),
      s"bounded heap lost its map-side partial:\n$plan")
  }

  test("table profile reads the table once, through one Expand") {
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val plan = fmt(graft.operators.Profile.tableProfile(ev,
      Seq("event_id", "user_id", "event_type")))
    val scans = plan.linesIterator.count(
      _.matches("""^\(\d+\) Scan parquet.*"""))
    assert(scans === 1, s"profile must not rescan per column ($scans scans)")
    assert(plan.contains("Expand"),
      s"multi-distinct lost its Expand plan:\n$plan")
  }

  test("key skew tops out in a bounded TakeOrdered, no full census sort") {
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val plan = fmt(graft.operators.Profile.keySkew(ev, "user_id", 10))
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k lost its bounded form:\n$plan")
  }

  test("path census rides one user-partitioned window, never a global one") {
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val plan = fmt(graft.operators.EventAnalytics.pathCensus(ev, 3,
      tsUs = EventLog.tsUsOf(ev)))
    // Both lags must fuse into a single per-user Window node (one sort,
    // not one per lag). The counts subtree prints twice in the formatted
    // plan — once feeding the output, once feeding the broadcast total,
    // deduped by exchange reuse at runtime — so pin the SHAPE of every
    // Window node rather than a global node count.
    val windowArgs = plan.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    assert(windowArgs.nonEmpty, s"window lags vanished from the plan:\n$plan")
    windowArgs.foreach { args =>
      assert(args.contains("__p1#") && args.contains("__p2#"),
        s"lags did not share one window:\n$plan")
      assert(args.contains("windowspecdefinition(user_id#"),
        s"window lost its per-user partitioning (global sort!):\n$plan")
    }
  }

  test("the incremental funnel fold plans no window and no data-sized sort") {
    // the fold is one user-keyed aggregation + one state join — a Window
    // here would mean the per-user chain walk regressed to the k-join
    // shape whose nested plan OOMed the driver
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val st = graft.operators.EventAnalytics.emptyFunnelState(spark, 3)
    val plan = fmt(graft.operators.EventAnalytics.funnelIncremental(
      ev, st, Seq("view", "click", "purchase"),
      tsUs = EventLog.tsUsOf(ev)))
    assert(!plan.contains("Window"), s"fold regressed to windows:\n$plan")
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate")
      || plan.contains("HashAggregate"),
      s"collect-based fold lost its aggregate:\n$plan")
  }

  test("hard-negative mining broadcasts the candidate list, never the corpus") {
    // q180's claim: everything after bmtop is probe×depth-sized, and the
    // embedding attach streams the embeddings scan against a BROADCAST
    // candidate frame — a sort-merge join here would shuffle the corpus
    // for a 60-row lookup side.
    val plan = fmt(SparkEntry.benchQueries("q180_hard_negatives")(spark, dir))
    assert(plan.contains("BroadcastHashJoin"),
      s"candidate attach not broadcast:\n$plan")
  }

  test("embedding moment census keeps its aggregate partial (map-side)") {
    // q186's scale claim: the posexplode fan-out collapses to ≤ 64 rows
    // per (label, dim) per partition BEFORE the shuffle — a final-only
    // aggregate would move one row per (vector × dim) across the wire.
    val plan = fmt(SparkEntry.benchQueries("q186_embedding_moments")(spark, dir))
    assert(plan.contains("HashAggregate"), s"no hash aggregate:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("audio window plan is scan → project/explode, no join, one exchange") {
    // q189's claim: the planner moves metadata only — a single narrow
    // pass from the scan through the window Generate. The one Exchange
    // is the fixture's own `spread` repartition (input distribution),
    // not operator work; anything beyond it means the plan grew a
    // shuffle or a join it doesn't need.
    val plan = fmt(SparkEntry.benchQueries("q189_audio_window_plan")(spark, dir))
    assert(!plan.contains("Join"), s"window planning joined:\n$plan")
    assert("Exchange \\(".r.findAllIn(plan).size <= 1,
      s"window planning shuffled beyond the input spread:\n$plan")
  }

  test("WARC/PDF container parses are narrow: scan → parse, no shuffle") {
    // the container claim at 100 TB: one file = one partition = one
    // sequential parse riding the binaryFile scan — any Exchange means
    // bytes started crossing the wire before the members were reduced
    // to header rows
    for (q <- Seq("q222_warc_members", "q228_pdf_objects",
        "q234_tar_entries")) {
      val plan = fmt(SparkEntry.benchQueries(q)(spark, dir))
      assert(!plan.contains("Exchange"), s"$q shuffled raw bytes:\n$plan")
      assert(!plan.contains("Join"), s"$q joined:\n$plan")
    }
  }

  test("chat parse/stats are narrow; SFT dedup rides ONE prompt exchange") {
    // q236: beyond the deliberate round-robin input spread, the JSON
    // round-trip and the turn scan are per-conversation column algebra
    // — a second Exchange would mean transcript bytes crossed the wire
    // for a row-local computation
    val stats = fmt(SparkEntry.benchQueries("q236_chat_turns")(spark, dir))
    assert("Exchange \\(".r.findAllIn(stats).size <= 1,
      s"q236 shuffled beyond the input spread:\n$stats")
    assert(!stats.contains("Join"), s"q236 joined:\n$stats")
    // q237: the input spread plus exactly the one hash partition on
    // prompt_hash that exact dedup requires — the explosion and the
    // prompt render stay narrow (and run against the parse-once cached
    // frame, never re-deriving the corpus per reference)
    val pairs = fmt(SparkEntry.benchQueries("q237_sft_pairs")(spark, dir))
    assert("Exchange \\(".r.findAllIn(pairs).size <= 2,
      s"q237 shuffled beyond spread + prompt key:\n$pairs")
    assert(pairs.contains("InMemoryTableScan") ||
      pairs.contains("TableCacheQueryStage"),
      s"q237 lost its parse-once barrier:\n$pairs")
  }

  test("robots gate broadcasts the policy table") {
    // the rule table is domains-sized (here: six literal policies);
    // the per-URL join must be broadcast, never a corpus shuffle
    val plan = fmt(SparkEntry.benchQueries("q225_robots_gate")(spark, dir))
    assert(plan.contains("BroadcastHashJoin"),
      s"policy join not broadcast:\n$plan")
  }

  test("unigram training plans no window; census aggs stay partial") {
    // the Viterbi fold is a per-row column aggregate — a Window here
    // would mean the DP regressed to a corpus-wide sort
    val plan = fmt(SparkEntry.benchQueries("q226_unigram_train")(spark, dir))
    assert(!plan.contains("Window"), s"unigram planned a window:\n$plan")
    assert(plan.contains("HashAggregate"), s"census lost its agg:\n$plan")
  }

  test("MG truncate is join-free: one exchange, two windows") {
    // the (k+1)-th count must reach rows through a second window over
    // the SAME partitioning — a join here re-introduces the broadcast
    // job per merge step that made q243 run 40x slow
    import spark.implicits._
    val census = Seq(("a", "x", 5L, 0L), ("a", "y", 3L, 0L))
      .toDF("grp", "term", "n", "err")
    val plan = fmt(graft.llm.HeavyHitters.truncate(census, 2, Seq("grp")))
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(plan).size
    assert(exchanges == 1, s"truncate must plan exactly 1 exchange:\n$plan")
    assert(!plan.contains("Join"), s"truncate must not join:\n$plan")
  }

  test("MG merge rides one exchange end to end (grp-subset partitioning)") {
    // window on grp, groupBy (grp, term), truncate's windows on grp —
    // all satisfied by the ONE grp hash partitioning
    import spark.implicits._
    def s(rows: (String, String, Long, Long)*) =
      rows.toDF("grp", "term", "n", "err")
    val plan = fmt(graft.llm.HeavyHitters.merge(
      s(("a", "x", 5L, 1L)), s(("a", "y", 3L, 2L)), Seq("grp"), 2))
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(plan).size
    assert(exchanges == 1, s"merge must plan exactly 1 exchange:\n$plan")
    assert(!plan.contains("Join"), s"merge must not join:\n$plan")
  }

  test("host edge census keeps its map-side partial agg, no window") {
    val plan = fmt(SparkEntry.benchQueries("q247_host_links")(spark, dir))
    assert(plan.contains("partial_count"),
      s"edge census lost its partial agg:\n$plan")
    assert(!plan.contains("Window"), s"edge census planned a window:\n$plan")
  }

  test("container walks are narrow: no exchange before the entry rows") {
    // ZIP/TAR parse rides the binaryFile scan; a shuffle here would
    // move archive bytes
    import spark.implicits._
    val files = Seq(("a.zip", graft.source.ZipFixtures.archive(Seq(
      graft.source.ZipFixtures.Member("t.txt", 0, "x".getBytes("ISO-8859-1"),
        0L, graft.source.ZipFixtures.DosDate)))))
      .toDF("path", "content")
    val plan = fmt(graft.source.Zip.withZipEntries(files))
    assert(!plan.contains("Exchange"),
      s"zip walk must not shuffle:\n$plan")
  }

  test("no declared query plans a cartesian product (fleet-wide guard)") {
    // BroadcastNestedLoopJoin against a broadcast-small side is a chosen
    // shape (ANN query sets, centroid tables); CartesianProduct — both
    // sides big, every pair materialized — must never appear. This runs
    // every bench plan so a future operator edit cannot silently
    // introduce an all-pairs join.
    SparkEntry.benchQueries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a cartesian product:\n$plan")
    }
  }
}
