package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Sampling

/** Token-budget mixture planner: proportional split, epoch cap, one
  * water-fill redistribution round, and the split-division overflow
  * domain. */
class MixturePlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def plan(rows: Seq[(String, Long, Long)], budget: Long,
                   maxEpochsMicro: Long) = {
    import spark.implicits._
    Sampling.mixturePlan(rows.toDF("source", "avail_tokens", "weight"),
        budget, maxEpochsMicro)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(3), r.getLong(4),
        r.getLong(5), r.getBoolean(6))))
      .toMap
  }

  test("capped source's surplus water-fills the uncapped one") {
    // wsum=4: desired A=250 (cap 2000), B=750 (cap 200 -> capped,
    // surplus 550). w2=1 -> A gets all 550: alloc 800, 0.8 epochs.
    val out = plan(Seq(("A", 1000L, 1L), ("B", 100L, 3L)),
      budget = 1000L, maxEpochsMicro = 2000000L)
    assert(out("A") === ((250L, 800L, 800000L, false)))
    assert(out("B") === ((750L, 200L, 2000000L, true)))
  }

  test("redistribution is itself capped; all-capped leaves the surplus") {
    // both cap below desired: w2=0, allocs stay at cap
    val out = plan(Seq(("A", 10L, 1L), ("B", 10L, 1L)),
      budget = 1000L, maxEpochsMicro = 1000000L)
    assert(out("A") === ((500L, 10L, 1000000L, true)))
    assert(out("B") === ((500L, 10L, 1000000L, true)))
  }

  test("zero-weight and zero-avail sources are inert") {
    val out = plan(Seq(("A", 1000L, 2L), ("Z", 1000L, 0L), ("E", 0L, 2L)),
      budget = 400L, maxEpochsMicro = 1000000L)
    // wsum=4: A desired 200, Z desired 0, E desired 200 but cap 0 ->
    // capped, surplus 200 redistributes over w2=2 (A and Z): A gets
    // +200, Z gets +0 (weight 0)
    assert(out("Z") === ((0L, 0L, 0L, false)))
    assert(out("E") === ((200L, 0L, 0L, true)))
    assert(out("A") === ((200L, 400L, 400000L, false)))
  }

  test("split division is exact at the 100 TB domain (no Long overflow)") {
    val avail = 5000000000123L // 5e12 tokens in one source
    val out = plan(Seq(("big", avail, 1L)), budget = 20000000000000L,
      maxEpochsMicro = 2500000L)
    val capExact = (BigInt(avail) * 2500000 / 1000000).toLong
    // desired = budget (only source); cap (~1.25e13) binds below it
    assert(out("big")._1 === 20000000000000L)
    assert(out("big")._2 === capExact)
    val epochsExact = (BigInt(capExact) * 1000000 / avail).toLong
    assert(out("big")._3 === epochsExact)
    assert(out("big")._4 === true)
  }

  test("mis-set epoch cap fails loudly") {
    import spark.implicits._
    val df = Seq(("A", 10L, 1L)).toDF("source", "avail_tokens", "weight")
    intercept[IllegalArgumentException] {
      Sampling.mixturePlan(df, budget = 10L, maxEpochsMicro = 0L)
    }
    intercept[IllegalArgumentException] {
      Sampling.mixturePlan(df, budget = -1L, maxEpochsMicro = 1000000L)
    }
  }

  private def messageChain(t: Throwable): String =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")

  test("weight domain fails loudly: all-zero, negative, and NULL weights") {
    import spark.implicits._
    // all-zero wsum: without the guard, NULL desired rides least()'s
    // null-skipping into alloc1 = cap — every source silently maxes out
    val zero = Seq(("A", 10L, 0L), ("B", 10L, 0L))
      .toDF("source", "avail_tokens", "weight")
    val eZero = intercept[Throwable] {
      Sampling.mixturePlan(zero, budget = 100L).collect()
    }
    assert(messageChain(eZero).contains("weight sum is 0"))
    val neg = Seq(("A", 10L, 1L), ("B", 10L, -2L))
      .toDF("source", "avail_tokens", "weight")
    val eNeg = intercept[Throwable] {
      Sampling.mixturePlan(neg, budget = 100L).collect()
    }
    assert(messageChain(eNeg).contains("nonnegative"))
    val nul = Seq(("A", 10L, Some(1L)), ("B", 10L, Option.empty[Long]))
      .toDF("source", "avail_tokens", "weight")
    val eNul = intercept[Throwable] {
      Sampling.mixturePlan(nul, budget = 100L).collect()
    }
    assert(messageChain(eNul).contains("nonnegative"))
  }

  test("applyMixturePlan: full epochs repeat, fractional pass is a " +
    "deterministic hash subset, zero-epoch sources drop") {
    import spark.implicits._
    val docs = ((1 to 20).map(i => (i.toLong, "A")) ++
      (21 to 25).map(i => (i.toLong, "B")) ++
      (26 to 28).map(i => (i.toLong, "C")))
      .toDF("doc_id", "source")
    // 2.5 epochs of A, exactly 1 of B, none of C
    val plan = Seq(("A", 2500000L), ("B", 1000000L), ("C", 0L))
      .toDF("source", "epochs_micro")
    def run() = Sampling.applyMixturePlan(docs, plan)
      .select("doc_id", "source", "epoch").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val out = run()
    assert(out == run()) // pure function of the rows — replayable
    val byDoc = out.groupBy(_._1)
    // every A doc: epochs 0,1 always; epoch 2 for the hash subset only
    (1 to 20).foreach { i =>
      val epochs = byDoc(i.toLong).map(_._3)
      assert(epochs == Set(0, 1) || epochs == Set(0, 1, 2))
    }
    val extras = (1 to 20).count(i => byDoc(i.toLong).size == 3)
    assert(extras > 0 && extras < 20,
      s"fractional pass should select a strict subset, got $extras/20")
    (21 to 25).foreach(i => assert(byDoc(i.toLong).map(_._3) == Set(0)))
    assert((26 to 28).forall(i => !byDoc.contains(i.toLong)))
  }
}
