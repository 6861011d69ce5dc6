package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.{Features, Similarity}

/** Measurement scaffold for the optimization rounds — times sub-plans
  * of hot queries to attribute stage CPU (round 16 used it to localize
  * the sign-LSH featurize/sign costs; kept for the next optimization
  * round). Not part of the engine's query surface. */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.ensure(GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val cpuNs = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (e.taskMetrics != null)
            cpuNs.addAndGet(e.taskMetrics.executorCpuTime)
      })
    def timed(label: String)(body: => Unit): Unit = {
      CacheBarriers.releaseAll()
      spark.sharedState.cacheManager.clearCache()
      Thread.sleep(300)
      val c0 = cpuNs.get(); val t0 = System.nanoTime()
      body
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      val dc = (cpuNs.get() - c0) / 1e9
      println(f"PROBE $label%-28s wall=$dt%7.2f cpu=$dc%8.2f")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val DupOffset = 200000L
    val VarOffset = 100000L
    def truncWords(ws: org.apache.spark.sql.Column) =
      slice(ws, lit(1), greatest((size(ws) * 4) / 5, lit(1)))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
      .repartition(spark.sparkContext.defaultParallelism)
    val ws = graft.llm.TextHash.words(col("text"))
    val dups = docs.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + DupOffset).as("doc_id"), col("text"))
    val vars = docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + VarOffset).as("doc_id"),
        concat_ws(" ", truncWords(ws)).as("text"))
    val corpus = docs.unionByName(dups).unionByName(vars)
      .repartition(spark.sparkContext.defaultParallelism)

    val n = corpus.count()
    (1 to 2).foreach { round =>
      println(s"== round $round ==")
      def vecs = Features.hashedTfIdfVectors(corpus,
        Features.dfCensus(corpus), nDocs = n, dim = 64)
      timed("tfidf vectors") (noop(vecs))
      timed("clean+filter") {
        noop(vecs.select(col("doc_id"),
          graft.llm.SimProbe.clean(col("v")).as("v"))
          .filter(col("v").isNotNull && size(col("v")) === 64))
      }
      timed("clean+vn") {
        noop(vecs.select(col("doc_id"),
          graft.llm.SimProbe.clean(col("v")).as("v"))
          .filter(col("v").isNotNull && size(col("v")) === 64)
          .select(col("doc_id"), col("v"),
            sqrt(Similarity.dot(col("v"), col("v"))).as("vn")))
      }
      timed("signed") {
        noop(Similarity.signVectors(vecs, 64, "doc_id", "v", 64, 4))
      }
      timed("signed barriered vecs") {
        noop(Similarity.signVectors(
          graft.CacheBarriers.barrier(vecs), 64, "doc_id", "v", 64, 4))
      }
      timed("full pairs") {
        noop(Similarity.signLshNearDupPairs(vecs, minCos = 0.90, dim = 64,
          idCol = "doc_id", vecCol = "v", bands = 4))
      }
      timed("embed signed") {
        val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
          .select(col("vec_id"),
            transform(col("embedding"), x => x.cast("double")).as("v"))
        noop(Similarity.signVectors(e, 64, "vec_id", "v", 64, 8))
      }
    }
    spark.stop()
  }
}
