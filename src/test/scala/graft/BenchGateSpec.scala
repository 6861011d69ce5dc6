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
                   cores: Int = 32) =
    Bench.dirtyReason(cpw, healed, before, after, cores)

  test("clean round-12 committed sentinel passes") {
    // committed record: cpu_per_wall 5.9, healed 12, loadavg 10.57/12.99
    assert(gate(5.9, 12, Some(10.57), Some(12.99)).isEmpty)
  }

  test("the round-12 dirty driver pass is diverted on cpu_per_wall") {
    val why = gate(4.58, 35, Some(15.77), Some(20.0))
    assert(why.isDefined && why.get.contains("cpu_per_wall"))
  }

  test("cpu_per_wall at the floor is clean, just below is dirty") {
    assert(gate(5.0, 0, None, None).isEmpty)
    assert(gate(4.99, 0, None, None).isDefined)
  }

  test("the floor scales with the core count") {
    // 5.0 * 8/32 = 1.25: a deliberate 8-core run at cpw 1.3 is clean
    assert(gate(1.3, 0, None, None, cores = 8).isEmpty)
    assert(gate(1.2, 0, None, None, cores = 8).isDefined)
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
}
