package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the full-run record gate ([[Bench.dirtyReason]]) — the predicate
  * deciding whether a complete `graft.Bench` pass may overwrite
  * `bench/qmap.json` or must divert to `qmap.dirty.json`. Thresholds come
  * from BASELINE.md's dirty-run discipline; the concrete dirty vector is
  * the round-12 driver pass (cpu/wall 4.58, healed 35, loadavg 15.77 on
  * 32 cores) that overwrote the clean 245.8 s record with 281.8 s. */
class BenchGateSpec extends AnyFunSuite {

  private def gate(cpw: Double, healed: Int,
                   before: Option[Double], after: Option[Double],
                   cores: Int = 32, priorCpw: Option[Double] = None) =
    Bench.dirtyReason(cpw, healed, before, after, cores, priorCpw)

  test("clean round-12 committed sentinel passes against its own band") {
    // committed record: cpu_per_wall 5.9, healed 12, loadavg 10.57/12.99
    assert(gate(5.9, 12, Some(10.57), Some(12.99),
      priorCpw = Some(5.9)).isEmpty)
  }

  test("the round-12 dirty driver pass is diverted on cpu_per_wall") {
    // 4.58 against the then-committed 5.9 band: floor 5.9*0.8 = 4.72
    val why = gate(4.58, 35, Some(15.77), Some(20.0), priorCpw = Some(5.9))
    assert(why.isDefined && why.get.contains("cpu_per_wall"))
  }

  test("the band tracks suite composition through the committed record") {
    // round-13 fold reworks moved the idle-host band to ~4.3: a 4.31
    // run against a 4.31 record is clean (floor 3.45)...
    assert(gate(4.31, 21, Some(8.39), Some(17.16),
      priorCpw = Some(4.31)).isEmpty)
    // ...and a contended pass of the same suite still diverts
    assert(gate(3.1, 30, Some(40.0), Some(45.0), priorCpw = Some(4.31))
      .exists(_.contains("cpu_per_wall")))
  }

  test("no committed record bootstraps on the static floor") {
    assert(gate(3.0, 0, None, None).isEmpty)
    assert(gate(2.99, 0, None, None).isDefined)
  }

  test("the floor scales with the core count") {
    // prior 4.31: floor 4.31*0.8*8/32 = 0.862 at 8 cores
    assert(gate(0.9, 0, None, None, cores = 8,
      priorCpw = Some(4.31)).isEmpty)
    assert(gate(0.8, 0, None, None, cores = 8,
      priorCpw = Some(4.31)).isDefined)
  }

  test("a contention storm of heals is dirty even at clean cpu_per_wall") {
    assert(gate(5.9, Bench.CleanHealedCap, None, None).isEmpty)
    val why = gate(5.9, Bench.CleanHealedCap + 1, None, None)
    assert(why.isDefined && why.get.contains("healed"))
  }

  test("loadavg far above cores at either edge is dirty") {
    val cap = Bench.CleanLoadFactor * 32
    assert(gate(5.9, 0, Some(cap), Some(cap)).isEmpty)
    assert(gate(5.9, 0, Some(cap + 1), Some(10.0)).exists(_.contains("loadavg")))
    assert(gate(5.9, 0, Some(10.0), Some(cap + 1)).exists(_.contains("loadavg")))
  }

  test("missing loadavg samples are not a dirty signal by themselves") {
    assert(gate(5.9, 0, None, None).isEmpty)
  }

  test("only a clean canonical-SF full run may write the record") {
    // BASELINE.md's numbers, prior anchors, and the cpu_per_wall band
    // are sf0.1 quantities — a full run at another SF must never
    // overwrite them, clean or not
    assert(Bench.recordTarget(filtered = false, "sf0.1", dirty = false)
      == "qmap.json")
    assert(Bench.recordTarget(filtered = false, "sf0.1", dirty = true)
      == "qmap.dirty.json")
    assert(Bench.recordTarget(filtered = false, "sf0.001", dirty = false)
      == "qmap.sf0.001.json")
    assert(Bench.recordTarget(filtered = true, "sf0.1", dirty = false)
      == "qmap.partial.json")
    // filtered wins over SF routing: a partial run is a partial run
    assert(Bench.recordTarget(filtered = true, "sf0.001", dirty = false)
      == "qmap.partial.json")
  }

  test("the anchor composition check keys on name-set overlap") {
    val base = (1 to 100).map(i => s"q$i").toSet
    // identical suite anchors
    assert(Bench.compositionMatches(base, base))
    // growth within 5% still anchors (shared queries dominate)
    assert(Bench.compositionMatches(base, base + "q101" + "q102"))
    // growth beyond 5% falls back to the bootstrap floor (round-16
    // deadlock: an n=233 anchor gating an n=254 suite)
    val grown = base ++ (101 to 121).map(i => s"q$i")
    assert(!Bench.compositionMatches(base, grown))
    // the round-16 ADVICE case: SAME COUNT but >5% of the names are
    // renames/replacements — the count check anchored on a stale band,
    // the overlap check must not
    val renamed = base -- (1 to 10).map(i => s"q$i") ++
      (1 to 10).map(i => s"r$i")
    assert(!Bench.compositionMatches(renamed, base))
    // an empty registry never anchors
    assert(!Bench.compositionMatches(base, Set.empty))
  }

  test("last_run.json carries the headline plus the full query map") {
    val headline =
      """{"metric":"total","value":12.5,"n":2,"unit":"sec","sf":"/d/sf0.1"}"""
    val line = Bench.lastRunLine(headline,
      Seq("q01_envelope" -> 1.25, "q02_ns_filter" -> 0.5))
    // one JSON object: headline fields preserved, queries spliced in
    assert(line.startsWith(headline.dropRight(1)))
    assert(line.contains(""""queries":{"q01_envelope":1.25,"q02_ns_filter":0.5}"""))
    assert(line.endsWith("}}"))
    // parses as a single JSON document (no nested-line format drift)
    assert(line.count(_ == '{') == 2 && line.count(_ == '}') == 2)
  }

  test("only a canonical-core full run may write the record") {
    // the committed walls are local[32] quantities; a full sf0.1 run at
    // the default SPARK_GRAFT_CPUS=4 passes the core-scaled cpu_per_wall
    // band yet carries ~8x walls — it must route to a diagnostic file,
    // never re-anchor the prior heal trigger
    assert(Bench.recordTarget(filtered = false, "sf0.1", dirty = false,
      cores = 4) == "qmap.cores4.json")
    // even a dirty small-core run routes by cores (the dirty label is
    // meaningless against the wrong-band floor)
    assert(Bench.recordTarget(filtered = false, "sf0.1", dirty = true,
      cores = 4) == "qmap.cores4.json")
    // SF routing wins over core routing — one diagnostic axis at a time,
    // named by the rarer deviation
    assert(Bench.recordTarget(filtered = false, "sf0.001", dirty = false,
      cores = 4) == "qmap.sf0.001.json")
    assert(Bench.recordTarget(filtered = false, "sf0.1", dirty = false,
      cores = Bench.CanonicalCores) == "qmap.json")
  }
}
