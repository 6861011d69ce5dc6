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

    val _ = (corpus, Features, Similarity) // round-16 probes retired

    // ── round-17 probes: q226 unigram-train decomposition ─────────────
    val U = graft.llm.Unigram
    val B = graft.llm.Bpe
    val p = U.Params()
    val plain = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text")
    (1 to 2).foreach { round =>
      println(s"== round $round ==")
      timed("word census") (noop(B.wordCensus(plain)))
      timed("trunc census") {
        noop(U.truncCensus(B.wordCensus(plain), p.maxWordLen))
      }
      timed("seed+costs") {
        noop(U.withCosts(U.seedVocab(
          U.truncCensus(B.wordCensus(plain), p.maxWordLen), p)))
      }
      timed("train r1 (native dp)") {
        noop(U.train(B.wordCensus(plain), p, rounds = 1))
      }
      val wtr = graft.CacheBarriers.barrier(
        U.truncCensus(B.wordCensus(plain), p.maxWordLen))
      val vocab = U.collectVocab(U.withCosts(U.seedVocab(wtr, p)))
      timed("segment native") (noop(U.segmentCensus(wtr, vocab, p)))
      timed("segment column form") {
        noop(U.segmentCensusColumnForm(wtr, vocab, p))
      }
      // ── minhash signature: does deriving bkeys from the sig alias
      //    re-evaluate the minhash chain (the SignPlanes disease), or
      //    does codegen subexpression elimination already dedupe it?
      val docs2 = spark.read.parquet(s"$sfDir/documents.parquet")
        .select("doc_id", "text")
      timed("signature sig only") {
        noop(graft.llm.Dedup.withSignature(docs2)
          .select(col("doc_id"), col("sh"), col("sig")))
      }
      timed("signature sig+bkeys") {
        noop(graft.llm.Dedup.withSignature(docs2)
          .select(col("doc_id"), col("sh"), col("bkeys")))
      }
    }
    spark.stop()
  }
}
