package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Chunking

/** [[Chunking.withChunks]] — deterministic overlapping word windows.
  * Pins the window schedule (full-window starts + clipped tail), the
  * short/empty/null degradations, and full coverage (every word lands
  * in at least one chunk). */
class ChunkingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def df(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def chunks(d: org.apache.spark.sql.DataFrame, n: Int, s: Int) =
    Chunking.withChunks(d, n, s).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))

  test("overlapping windows with a clipped tail") {
    val text = (0 until 10).map(i => s"w$i").mkString(" ")
    val out = chunks(df(1L -> text), 4, 3)
    assert(out.toSeq == Seq(
      (1L, 0L, "w0 w1 w2 w3", 4L),
      (1L, 1L, "w3 w4 w5 w6", 4L),
      (1L, 2L, "w6 w7 w8 w9", 4L)))
  }

  test("tail shorter than a window clips, never pads") {
    val text = (0 until 9).map(i => s"w$i").mkString(" ")
    val out = chunks(df(1L -> text), 4, 3)
    assert(out.map(_._4).toSeq == Seq(4L, 4L, 3L))
    assert(out.last._3 == "w6 w7 w8")
  }

  test("short, exact-size, empty, and NULL documents degrade per contract") {
    val exact = (0 until 4).map(i => s"w$i").mkString(" ")
    val out = chunks(
      df(1L -> "a b", 2L -> exact, 3L -> "")
        .unionByName(df(4L -> "x").withColumn("text",
          lit(null).cast("string"))),
      4, 3)
    assert(out.toSeq == Seq(
      (1L, 0L, "a b", 2L),       // shorter than a window: one whole chunk
      (2L, 0L, exact, 4L),       // exactly one window, no empty tail
      (3L, 0L, "", 0L)))         // empty text: one empty chunk, row kept
    assert(!out.map(_._1).contains(4L)) // NULL text: quarantined
  }

  test("every word is covered by at least one chunk") {
    val text = (0 until 57).map(i => s"w$i").mkString(" ")
    val out = chunks(df(1L -> text), 8, 5)
    val covered = out.flatMap(_._3.split(" ")).toSet
    assert((0 until 57).forall(i => covered.contains(s"w$i")))
  }
}
