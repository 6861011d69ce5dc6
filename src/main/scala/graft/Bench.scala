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
  */
object Bench {
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
    val results = names.map { name =>
      val times = (1 to repeat).map { _ =>
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
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val med = times(times.length / 2)
      // One short JSONL line per query, flushed as it completes: the
      // aggregate map line grows with the suite (~90 queries) and artifact
      // capture has truncated long lines from either end before; these
      // lines are individually short, so no truncation can amputate the
      // per-query record. "q" disambiguates them from the headline metric.
      println(s"""{"q":"$name","sec":$med,"runs":${times.length}}""")
      Console.flush()
      name -> med
    }
    // The aggregate map line must fit the driver's artifact-capture
    // window (~3 KB: round 7's full-name 9-decimal map exceeded it and
    // the artifact recorded parsed:null). Two length levers: keys are
    // the short qNN prefix (the contract's own example uses "q1":sec;
    // full names remain in the per-query JSONL lines above) and values
    // round to milliseconds — ~1.4 KB at 104 queries, safely inside the
    // window with headroom for suite growth.
    val qs = results.map { case (k, v) =>
      "\"" + k.takeWhile(_ != '_') + "\":" + (math.round(v * 1000) / 1000.0)
    }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // Emit a compact headline line on BOTH sides of the map so any
    // one-sided truncation still preserves {total, n} (round 5 lost the
    // leading total when the head was cut).
    val headline = s"""{"metric":"total","value":$total,"n":${results.length},"unit":"sec","sf":"$sfDir"}"""
    println(headline)
    println(s"""{"metric":"total","value":$total,"n":${results.length},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    println(headline)
    spark.stop()
  }
}
