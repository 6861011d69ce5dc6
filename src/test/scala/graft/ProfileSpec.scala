package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Profile

/** Table profiling and key-skew: exact counts on a hand corpus, the
  * blank-string branch, the guard rails, and rank determinism. */
class ProfileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def df = {
    import spark.implicits._
    Seq(
      (Some(1L), "a", "x"), (Some(1L), "b", " "),
      (Some(2L), "a", ""), (None, "a", null))
      .toDF("id", "k", "s")
  }

  test("per-column nulls, distincts, and blanks are exact") {
    val out = Profile.tableProfile(df, Seq("id", "k", "s")).collect()
      .map(r => r.getAs[String]("column") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_nulls"),
          r.getAs[Long]("n_distinct"), Option(r.get(5))))).toMap
    assert(out("id") === ((4L, 1L, 2L, None))) // n_blank NULL: not a string
    assert(out("k") === ((4L, 0L, 2L, Some(0L))))
    assert(out("s") === ((4L, 1L, 3L, Some(2L)))) // "" and " " both blank
    intercept[IllegalArgumentException] {
      Profile.tableProfile(df, Seq("nope"))
    }
  }

  test("keySkew ranks by count desc then key asc, with exact shares") {
    val out = Profile.keySkew(df, "k", k = 5).collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[String]("key"),
        r.getAs[Long]("n"), r.getAs[Long]("share_micro")))
    assert(out.toSeq === Seq((1L, "a", 3L, 750000L), (2L, "b", 1L, 250000L)))
  }
}
