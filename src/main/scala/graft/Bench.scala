package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main. Measures every SparkEntry query end-to-end with a
  * `noop`-format write so the FULL declared plan executes — a bare
  * `.count()` would let Catalyst erase orderBys (EliminateSorts) and prune
  * most projections, under-measuring the real operators.
  *
  * A warm-up action runs before any timing so JVM/session startup cost
  * (JIT, codegen compiler, parquet footer caches) is not charged to
  * whichever query happens to run first. Queries run in sorted-name order
  * for run-over-run comparability. A failing query fails the whole run
  * loudly — a silent -1 would make a regression look like a speedup.
  *
  * The artifact of record is `bench/qmap.json` — one JSON line per query
  * with wall seconds, executor-CPU seconds, and the contention-heal
  * count, written to the repo so no per-query value ever depends on the
  * driver's bounded stdout-tail capture again (rounds 7/9/10 each lost
  * part of the stdout map to front- or back-truncation). Stdout keeps:
  * per-query JSONL lines as they complete, one headline (so a
  * head-truncated capture still has {total, n} early), then the ≤900 B
  * qmap part lines LAST, then the final headline — the order the
  * round-10 verdict prescribed (parts printed before a legacy full-map
  * line were flooded out of the tail window; the legacy line is gone).
  *
  * Contention self-healing: the round-9/10 artifacts were both dirtied by
  * host contention windows (artifact 43.9 s vs isolated 1.25 s for the
  * same unchanged query). A contended query's signature is wall inflated
  * while ITS OWN executor-CPU stays at true cost — cpu/wall collapses —
  * so any query whose median wall exceeds `HealWallFloor` with
  * per-query cpu/wall under `HealCpuFloor` is re-run once and the better
  * median kept. One bounded extra run per flagged query makes a single
  * contention window self-healing instead of a round-long artifact
  * defect; the heal count is recorded per query and in the headline.
  */
object Bench {

  /** Heal trigger: median wall above this (seconds) AND cpu/wall below
    * [[HealCpuFloor]]. Driver-heavy queries (BPE's per-round argmax) sit
    * under the wall floor when healthy; I/O-heavy ones (semantic-dedup
    * index writes) pay at most one extra run per invocation. */
  private val HealWallFloor = 2.0
  private val HealCpuFloor = 1.0

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.ensure(GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    def runToNoop(name: String): Unit =
      SparkEntry.benchQueries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    // SPARK_GRAFT_ONLY=q31,q45 restricts the run (local iteration aid).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.benchQueries.keys.toSeq.sorted
      .filter(n => only.forall(o => o.exists(n.startsWith)))
    // Warm-up: execute every query once untimed, so the timed pass
    // measures the operator plans rather than per-plan codegen + JIT
    // compilation (each query has a distinct plan, so warming one query
    // does not warm the others). Persisted frames from the warm-up are
    // dropped before timing — data comes cold off parquet every time.
    names.foreach(runToNoop)

    // SPARK_GRAFT_REPEAT times each query N times and keeps the median.
    // Default 3: single-pass numbers on a contended host have shown 2-17×
    // swings with no code change (round 6's driver artifact), so the
    // recorded number must be a median to be a usable artifact. Override
    // to 1 for quick local loops, 5 for A/B attribution.
    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "3").toInt

    // Contention sentinel: host load before/after plus the ratio of
    // executor-CPU-seconds to wall-seconds over the timed pass. A healthy
    // local[32] run keeps loadavg near/below the core count and cpu/wall
    // well above 1; a contaminated run shows loadavg >> cores while
    // cpu/wall collapses (threads exist but aren't scheduled).
    // Best-effort — /proc/loadavg is Linux-only.
    def loadavg(): String =
      try scala.util.Using.resource(
        scala.io.Source.fromFile("/proc/loadavg"))(
        _.mkString.trim.split(" ").take(3).mkString(","))
      catch { case _: Exception => "n/a" }
    val loadBefore = loadavg()
    val cpuNs = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (e.taskMetrics != null)
            cpuNs.addAndGet(e.taskMetrics.executorCpuTime)
      })
    // onTaskEnd events arrive asynchronously on the listener bus, so a
    // cpuNs read right after a job returns can miss its trailing tasks.
    // The bus API is private[spark]; a bounded quiesce poll (value stable
    // across two 20 ms samples) drains it without reflection — per-query
    // CPU attribution and the headline sentinel both read post-quiesce.
    def quiesceCpu(): Long = {
      var last = cpuNs.get()
      var stable = 0
      var waited = 0
      while (stable < 2 && waited < 2000) {
        Thread.sleep(20); waited += 20
        val now = cpuNs.get()
        if (now == last) stable += 1 else { stable = 0; last = now }
      }
      last
    }

    val timedWallNs = new java.util.concurrent.atomic.AtomicLong(0L)
    def timeOnce(name: String): Double = {
      // Isolate queries from each other: drop persisted frames left by
      // earlier queries (operators like Dedup/Similarity persist their
      // signature tables) so no query is timed against another's cache
      // hit or pays another's memory pressure. releaseAll() also drains
      // the barrier registry so the run doesn't pin every past query's
      // Dataset plans in memory.
      CacheBarriers.releaseAll()
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      runToNoop(name)
      val dt = System.nanoTime() - t0
      timedWallNs.addAndGet(dt)
      dt / 1e9
    }

    final case class QRes(name: String, sec: Double, cpuSec: Double,
                          runs: Int, healed: Int)
    val results = names.map { name =>
      val cpu0 = quiesceCpu()
      val times = (1 to repeat).map(_ => timeOnce(name)).sorted
      val cpu1 = quiesceCpu()
      var med = times(times.length / 2)
      val qCpu = (cpu1 - cpu0) / 1e9
      val qCpuPerWall = qCpu / math.max(times.sum, 1e-9)
      // self-heal: wall inflated while this query's own cpu/wall
      // collapsed ⇒ the host, not the plan — one bounded re-run
      var healed = 0
      if (med > HealWallFloor && qCpuPerWall < HealCpuFloor) {
        med = math.min(med, timeOnce(name))
        healed = 1
      }
      // One short JSONL line per query, flushed as it completes —
      // individually short, so no truncation can amputate the
      // per-query record. "q" disambiguates them from the headline.
      println(s"""{"q":"$name","sec":$med,"cpu_sec":${
        math.round(qCpu * 100) / 100.0},"runs":${times.length + healed}}""")
      Console.flush()
      QRes(name, med, qCpu, times.length + healed, healed)
    }
    val total = results.map(_.sec).sum
    val nHealed = results.map(_.healed).sum
    val wall = timedWallNs.get() / 1e9 // true wall across ALL timed runs
    val cpuSec = quiesceCpu() / 1e9    // executor CPU over the same span
    val loadAfter = loadavg()
    val sentinel =
      s""""load_before":"$loadBefore","load_after":"$loadAfter",""" +
        s""""cpu_sec":${math.round(cpuSec * 10) / 10.0},""" +
        s""""cpu_per_wall":${
          math.round(cpuSec / math.max(wall, 1e-9) * 100) / 100.0},""" +
        s""""healed":$nHealed"""
    val headline = s"""{"metric":"total","value":$total,"n":${
      results.length},"unit":"sec","sf":"$sfDir",$sentinel}"""

    // The committed artifact of record: full names, full precision,
    // per-query CPU, heal counts, and the sentinel — independent of any
    // stdout capture window.
    val dir = java.nio.file.Paths.get("bench")
    java.nio.file.Files.createDirectories(dir)
    val lines = (results.map { r =>
      s"""{"q":"${r.name}","sec":${r.sec},"cpu_sec":${r.cpuSec},""" +
        s""""runs":${r.runs},"healed":${r.healed}}"""
    } :+ headline).mkString("", "\n", "\n")
    java.nio.file.Files.write(dir.resolve("qmap.json"),
      lines.getBytes(java.nio.charset.StandardCharsets.UTF_8))

    // Early headline: a HEAD-truncated capture still sees {total, n}.
    println(headline)
    // The per-query map as fixed ≤900 B part lines, LAST before the final
    // headline so a 2000-char TAIL capture holds them (round 10 proved
    // anything printed after them floods them out). Keys are the short
    // qNN prefix; values round to centiseconds — bench/qmap.json holds
    // full precision.
    val entries = results.map { r =>
      "\"" + r.name.takeWhile(_ != '_') + "\":" +
        (math.round(r.sec * 100) / 100.0)
    }
    val parts = scala.collection.mutable.ArrayBuffer[String]()
    var cur = scala.collection.mutable.ArrayBuffer[String]()
    var len = 0
    for (e <- entries) {
      if (len + e.length + 1 > 850 && cur.nonEmpty) {
        parts += cur.mkString(",")
        cur = scala.collection.mutable.ArrayBuffer[String]()
        len = 0
      }
      cur += e; len += e.length + 1
    }
    if (cur.nonEmpty) parts += cur.mkString(",")
    parts.zipWithIndex.foreach { case (p, i) =>
      println(s"""{"metric":"qmap","part":${i + 1},"parts":${
        parts.length},"queries":{$p}}""")
    }
    println(headline)
    spark.stop()
  }
}
