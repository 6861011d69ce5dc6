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
