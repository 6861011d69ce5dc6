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
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runToNoop(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    val names = SparkEntry.queries.keys.toSeq.sorted
    // Warm-up: execute the first query once untimed (session + codegen warm).
    runToNoop(names.head)

    val results = names.map { name =>
      val t0 = System.nanoTime()
      runToNoop(name)
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
