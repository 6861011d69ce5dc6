package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Dedup
import graft.streaming.StreamingDecontam

/** The streaming decontamination twin: per-micro-batch runs of the batch
  * LSH operator against a once-signed eval set union to exactly the
  * one-shot batch answer (the operator is per-corpus-doc independent). */
class StreamingDecontamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // docs 1/3 near-duplicate eval docs; 2/4 are clean
  private val evalRows = Seq(
    (100L, "the quick brown fox jumps over the lazy dog again and again today"),
    (101L, "completely unrelated benchmark question about astrophysics and galaxies"))
  private val docRows = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "some training document with its own words nothing shared here"),
    (3L, "unrelated benchmark question about astrophysics and galaxies too"),
    (4L, "another clean document full of original phrasing and content"))

  test("per-batch streamed pairs equal the one-shot batch pairs") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val evalDf = evalRows.toDF("doc_id", "text")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-decontam").toString

    val collected = scala.collection.mutable.Set[(Long, Long, Int, Int)]()
    val src = MemoryStream[(Long, String)]
    // continuous trigger: the default AvailableNow would drain batch 1
    // and STOP, silently ignoring data added afterwards
    val q = StreamingDecontam.start(
      src.toDF().toDF("doc_id", "text"), evalDf, ckpt,
      onPairs = (pairs, _) => collected ++=
        pairs.as[(Long, Long, Int, Int)].collect(),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    src.addData(docRows.take(2))
    q.processAllAvailable()
    src.addData(docRows.drop(2))
    q.processAllAvailable()
    q.stop()

    val batch = Dedup.contaminationPairs(
        docRows.toDF("doc_id", "text"), evalDf)
      .as[(Long, Long, Int, Int)].collect().toSet
    assert(collected.toSet == batch)
    assert(batch.map(_._1) == Set(1L, 3L), "docs 1 and 3 are contaminated")
  }

  test("kill + resume does not re-emit or drop a batch (checkpoint replay)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val evalDf = evalRows.toDF("doc_id", "text")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-decontam-resume").toString
    val collected = scala.collection.mutable.ArrayBuffer[(Long, Long)]()

    val src1 = MemoryStream[(Long, String)]
    src1.addData(docRows.take(2))
    val q1 = StreamingDecontam.start(
      src1.toDF().toDF("doc_id", "text"), evalDf, ckpt,
      onPairs = (pairs, _) => collected ++=
        pairs.select("doc_id", "eval_id").as[(Long, Long)].collect())
    q1.processAllAvailable()
    q1.stop()

    // a NEW source on the same checkpoint, re-serving the already-
    // committed prefix: the checkpoint's offsets must skip it, so only
    // the second half's pairs are emitted — no re-emit, no hole
    val src2 = MemoryStream[(Long, String)]
    src2.addData(docRows.take(2))
    src2.addData(docRows.drop(2))
    val q2 = StreamingDecontam.start(
      src2.toDF().toDF("doc_id", "text"), evalDf, ckpt,
      onPairs = (pairs, _) => collected ++=
        pairs.select("doc_id", "eval_id").as[(Long, Long)].collect())
    q2.processAllAvailable()
    q2.stop()

    assert(collected.sorted == Seq((1L, 100L), (3L, 101L)))
  }
}
