package graft

import org.apache.spark.sql.SparkSession

/** Plan-capture main for the optimization rounds: writes the
  * `.explain("formatted")` output of each named bench query to
  * `plans/<tag>/<qname>_<suffix>.txt`, so plan-shape claims in
  * OPTIMIZATION_r*.md are checkable without running Spark.
  *
  * Usage: runMain graft.PlanDump <tag> <suffix> <q1,q2,...|all>
  * Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *        SPARK_GRAFT_CPUS   (default 4).
  *
  * Captures the BENCH plan (no verification-only presentation sort) —
  * the plan the timing measures. AQE leaves `isFinalPlan=false` here;
  * exchange/join shapes are still the planned ones the round's evidence
  * cites.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 3,
      "usage: PlanDump <tag> <suffix> <q1,q2,...|all>")
    val Array(tag, suffix, qarg) = args
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.ensure(GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    val names =
      if (qarg == "all") SparkEntry.benchQueries.keys.toSeq.sorted
      else qarg.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        .map(p => SparkEntry.benchQueries.keys.find(_.startsWith(p))
          .getOrElse(sys.error(s"no query matches prefix $p")))
    val dir = java.nio.file.Paths.get("plans", tag)
    java.nio.file.Files.createDirectories(dir)
    names.foreach { name =>
      val df = SparkEntry.benchQueries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(dir.resolve(s"${name}_$suffix.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"wrote plans/$tag/${name}_$suffix.txt (${txt.length} chars)")
      CacheBarriers.releaseAll()
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
