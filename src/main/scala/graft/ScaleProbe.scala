package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling-probe data synthesizer for the optimization rounds: the
  * driver's test data stops at sf0.1 (read-only, TESTDATA.md), which is
  * too small to demonstrate parallelism for most rows (the round-16
  * suite ran ~as fast at 8 cores as at 32 — per-query job-launch
  * overhead dominates sub-second rows). This main materializes an
  * sf0.1 × `factor` BENCH-ONLY corpus in a scratch directory: the three
  * volume tables (documents, events, embeddings) get `factor` id-shifted
  * copies; every other table is copied as-is. Results are for CORE-COUNT
  * SCALING RATIOS only — the synthetic corpus has no DuckDB oracle and
  * its absolute numbers are not pins; nothing here touches
  * /root/testdata or the committed bench record (a filtered bench run
  * routes to qmap.partial.json by construction).
  *
  * Usage: runMain graft.ScaleProbe <outDir> [factor]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ScaleProbe <outDir> [factor]")
    val outDir = args(0)
    val factor = if (args.length > 1) args(1).toInt else 10
    require(factor >= 2 && factor <= 100, s"factor=$factor")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.ensure(GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    def copies(df: DataFrame, idCol: String, shift: Long): DataFrame =
      (0 until factor).map(k =>
        df.withColumn(idCol, col(idCol) + lit(k * shift)))
        .reduce(_ unionByName _)
    tables.foreach { t =>
      val src = s"$sfDir/$t.parquet"
      if (new java.io.File(src).exists()) {
        val df = spark.read.parquet(src)
        val out = t match {
          case "documents" => copies(df, "doc_id", 10000000L)
          case "embeddings" => copies(df, "vec_id", 10000000L)
          case "events" => copies(df, "event_id", 100000000L)
          case _ => df
        }
        out.write.mode("overwrite").parquet(s"$outDir/$t.parquet")
        println(s"SCALE $t -> $outDir (${out.columns.length} cols)")
      } else println(s"SCALE $t absent in $sfDir, skipped")
    }
    spark.stop()
  }
}
