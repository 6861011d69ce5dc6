package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** T5: event-time tumbling windows with a watermark — late events beyond
  * the watermark are dropped, closed windows emit exactly once (append
  * mode). Not required for reference parity (it has no windows) but part
  * of the engine's analytic surface. */
class StreamingWindowSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(minute: Int) = Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("watermark drops late events; closed windows emit once") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val src = MemoryStream[(Timestamp, String)]
    val agg = src.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes").as("w"), col("k"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("win")
      .outputMode("append").start()

    src.addData((ts(5), "a"), (ts(7), "a")) // window [10:00,10:10)
    q.processAllAvailable()
    src.addData((ts(35), "a")) // advances watermark to 10:25 → closes 10:00 window
    q.processAllAvailable()
    src.addData((ts(2), "a")) // LATE: watermark already 10:25 → must be dropped
    src.addData((ts(55), "a")) // advances watermark to 10:45 → closes 10:30 window
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("win")
      .select(col("w.start").cast("string"), col("n"))
      .as[(String, Long)].collect().toMap
    // 10:00 window emitted with exactly the 2 on-time events — the late
    // 10:02 event did not reopen or re-emit it
    assert(rows("2026-01-01 10:00:00") == 2L)
    assert(rows("2026-01-01 10:30:00") == 1L)
  }
}
