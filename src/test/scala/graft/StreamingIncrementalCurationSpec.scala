package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Curation
import graft.streaming.StreamingCuration

/** The durable streaming form of incremental curation: bootstrap once,
  * stream batches against the artifact chain with checkpoint/resume, and
  * the accumulated kept corpus equals a full-batch curate over
  * everything ingested (batch-monotone ids make earlier verdicts
  * stable: representatives are min-id). */
class StreamingIncrementalCurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def text(i: Long): String =
    (0 until 26).map(j => s"s${i}x$j").mkString(" ")
  private def rev(t: String): String = t.split(" ").reverse.mkString(" ")
  private def trunc(t: String): String =
    t.split(" ").dropRight(5).mkString(" ")

  private def df(rows: Seq[(Long, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "source")
  }

  // bootstrap corpus + two ingest batches exercising cross-batch exact
  // dups, near-dups, and fresh content
  private val b1 = (0L until 20L).map(i => (i, text(i), "web"))
  private val b2 = Seq(
    (100L, text(3), "web"),          // exact dup of b1 -> dropped
    (101L, trunc(text(5)), "web"),   // near-dup of b1 -> dropped
    (102L, rev(text(7)), "books"))   // fresh -> kept
  private val b3 = Seq(
    (200L, rev(text(7)), "books"),   // exact dup of b2's kept doc
    (201L, trunc(rev(text(7))), "books"), // near-dup of b2's kept doc
    (202L, rev(text(9)), "books"))   // fresh -> kept

  private def keptSet(d: DataFrame): Set[Long] =
    d.select("doc_id").collect().map(_.getLong(0)).toSet

  test("bootstrap + streamed batches: kept union == full-batch curate") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stateDir = Files.createTempDirectory("graft-scur-state").toString
    val ckpt = Files.createTempDirectory("graft-scur-ckpt").toString
    StreamingCuration.bootstrap(df(b1), stateDir,
      sourceCol = Some("source"))

    val s1 = MemoryStream[(Long, String, String)]
    s1.addData(b2)
    StreamingCuration.start(s1.toDF().toDF("doc_id", "text", "source"),
      stateDir, ckpt, sourceCol = Some("source")).awaitTermination()

    // "crash": a new query on the same checkpoint replays nothing of b2
    // and processes only b3
    val s2 = MemoryStream[(Long, String, String)]
    s2.addData(b2)
    s2.addData(b3)
    StreamingCuration.start(s2.toDF().toDF("doc_id", "text", "source"),
      stateDir, ckpt, sourceCol = Some("source")).awaitTermination()

    val union = df(b1 ++ b2 ++ b3)
    val expected = keptSet(Curation.curate(union))
    assert(keptSet(StreamingCuration.keptCorpus(spark, stateDir)) == expected)
    assert(expected.contains(102L) && expected.contains(202L))
    assert(!expected.exists(i => Set(100L, 101L, 200L, 201L).contains(i)))

    // the surviving artifact chain equals a full rebuild
    val art = StreamingCuration.latestArtifacts(spark, stateDir)
      .getOrElse(fail("no committed artifacts"))
    val (_, full) = Curation.artifactsOf(union, sourceCol = Some("source"))
    def rows(d: DataFrame) = d.collect().map(_.toSeq).toSet
    assert(rows(art.hashReps) == rows(full.hashReps))
    assert(rows(art.clusters) == rows(full.clusters))
    assert(rows(art.lineCensus) == rows(full.lineCensus))
    assert(rows(art.sourceCounts.get) == rows(full.sourceCounts.get))
  }

  test("a replayed micro-batch is idempotent (at-least-once safe)") {
    val stateDir = Files.createTempDirectory("graft-scur-state2").toString
    StreamingCuration.bootstrap(df(b1), stateDir)
    StreamingCuration.mergeBatch(df(b2), 0L, stateDir)
    StreamingCuration.mergeBatch(df(b3), 1L, stateDir)
    def snapshot() = (
      keptSet(StreamingCuration.keptCorpus(spark, stateDir)),
      StreamingCuration.latestArtifacts(spark, stateDir).get
        .hashReps.collect().map(_.toSeq).toSet)
    val once = snapshot()
    StreamingCuration.mergeBatch(df(b3), 1L, stateDir) // replay
    assert(snapshot() == once)
    // a fresh checkpoint restarting batch ids under existing state is loud
    val e = intercept[IllegalArgumentException](
      StreamingCuration.mergeBatch(df(b3), 0L, stateDir))
    assert(e.getMessage.contains("further-progressed"))
  }

  test("an increment never re-reads the bootstrap corpus (black-box)") {
    // bootstrap from parquet on disk, then DELETE the source files: if
    // any stage of the incremental path touched the old corpus instead
    // of the artifacts, the merge would crash on the missing files
    val srcDir = Files.createTempDirectory("graft-scur-src").toString
    val stateDir = Files.createTempDirectory("graft-scur-state4").toString
    df(b1).write.mode("overwrite").parquet(srcDir)
    StreamingCuration.bootstrap(spark.read.parquet(srcDir), stateDir,
      sourceCol = Some("source"))
    val walk = Files.walk(java.nio.file.Paths.get(srcDir))
    try walk.sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.delete(p))
    finally walk.close()
    StreamingCuration.mergeBatch(df(b2), 0L, stateDir,
      sourceCol = Some("source"))
    assert(keptSet(StreamingCuration.keptCorpus(spark, stateDir))
      .contains(102L))
    val art = StreamingCuration.latestArtifacts(spark, stateDir).get
    assert(art.lineCensus.count() > 0)
  }

  test("streaming without bootstrap fails loudly") {
    val stateDir = Files.createTempDirectory("graft-scur-state3").toString
    val e = intercept[IllegalStateException](
      StreamingCuration.mergeBatch(df(b2), 0L, stateDir))
    assert(e.getMessage.contains("bootstrap"))
  }
}
