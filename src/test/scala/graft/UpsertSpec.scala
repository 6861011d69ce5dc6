package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Upsert

case class UpsertTestOp(event_id: Long, id: String, operation: String,
                        version: Long, document: String)

/** Last-writer-wins resolution vs a naive sequential replay: for any op
  * multiset, the distributed reduction must land on the same final state
  * the reference's ES external-versioning would (SURVEY §2.8 T4). */
class UpsertSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private type Op = UpsertTestOp
  private val Op = UpsertTestOp

  private def genOps(seed: Long): List[Op] = {
    val g = for {
      id <- Gen.chooseNum(1, 8)
      op <- Gen.oneOf("i", "u", "d")
      v <- Gen.chooseNum(0L, 50L)
    } yield (id.toString, op, v)
    Gen.listOfN(400, g).apply(Gen.Parameters.default, Seed(seed)).get
      .zipWithIndex.map { case ((id, op, v), i) =>
        Op(i.toLong, id, op, v, s"""{"n":$i}""")
      }
  }

  test("indexAsUpdate merges per field: latest non-null wins, gaps survive") {
    import org.apache.spark.sql.functions._
    // id 1: v1 sets (a=1, b=10); v2 sets only a=2  → merged (a=2, b=10)
    // id 2: v1 sets only b=5; v2 sets only a=7, v3 deletes → both field
    //   winners predate the delete fence, so the merge yields nulls (the
    //   caller's tombstone anti-join drops the key from the index anyway
    //   — the fence matters for i→d→u resurrection, pinned in
    //   StreamingIndexAsUpdateSpec)
    val df = Seq(
      (1L, "1", "i", 1L, Some(1), Some(10)),
      (2L, "1", "u", 2L, Some(2), None),
      (3L, "2", "i", 1L, None, Some(5)),
      (4L, "2", "u", 2L, Some(7), None),
      (5L, "2", "d", 3L, None, None)
    ).toDF("event_id", "id", "operation", "version", "a", "b")
    val got = Upsert.indexAsUpdate(df, Seq("a", "b"))
      .select("id", "a", "b", "merged_version")
      .as[(String, Option[Int], Option[Int], Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("1") == ((Some(2), Some(10), 2L)))
    assert(got("2") == ((None, None, 2L)))
  }

  test("liveDocuments/tombstones match a sequential max-version replay") {
    for (seed <- Seq(1L, 2L, 3L)) {
      val ops = genOps(seed)
      // reference model: per key, winner = max by (version, event_id)
      val winners = ops.groupBy(_.id).map { case (id, os) =>
        id -> os.maxBy(o => (o.version, o.event_id))
      }
      val expLive = winners.collect { case (id, o) if o.operation != "d" => id -> o.version }.toSet
      val expDead = winners.collect { case (id, o) if o.operation == "d" => id -> o.version }.toSet

      val df = ops.toDF()
      val live = Upsert.liveDocuments(df)
        .select("id", "version").as[(String, Long)].collect().toSet
      val dead = Upsert.tombstones(df)
        .select("id", "version").as[(String, Long)].collect().toSet
      assert(live == expLive, s"live mismatch, seed=$seed")
      assert(dead == expDead, s"tombstone mismatch, seed=$seed")
    }
  }
}
