package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-stage profiling aid for the optimization rounds: runs one bench
  * query to the noop sink with a listener that prints each completed
  * stage's executor CPU, run time, task count and the first line of its
  * callsite — the local[N] substitute for the Spark UI's stage table
  * (spark.ui.enabled is false in the canonical session).
  *
  * Usage: runMain graft.StageProbe <qprefix> [repeat]
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val qprefix = args(0)
    val repeat = if (args.length > 1) args(1).toInt else 1
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.ensure(GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    val name = SparkEntry.benchQueries.keys.find(_.startsWith(qprefix))
      .getOrElse(sys.error(s"no query matches $qprefix"))
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val cpu = si.taskMetrics.executorCpuTime / 1e9
        val run = si.taskMetrics.executorRunTime / 1e3
        if (cpu > 0.05 || run > 0.05)
          println(f"STAGE ${si.stageId}%4d cpu=$cpu%8.2f run=$run%8.2f " +
            f"tasks=${si.numTasks}%4d ${si.details.linesIterator.nextOption().getOrElse("")}")
      }
    })
    (1 to repeat).foreach { i =>
      CacheBarriers.releaseAll()
      spark.sharedState.cacheManager.clearCache()
      println(s"=== run $i of $name ===")
      val t0 = System.nanoTime()
      SparkEntry.benchQueries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      Thread.sleep(500) // let stage events drain
      println(f"=== wall ${(System.nanoTime() - t0) / 1e9}%.2f s ===")
    }
    spark.stop()
  }
}
