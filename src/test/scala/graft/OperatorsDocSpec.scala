package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the generated operator map ([[OperatorsDoc]] →
  * `docs/OPERATORS.md`) to the [[SparkEntry]] registry: the committed
  * file must list EXACTLY the registry's query names, so adding or
  * renaming a query without regenerating the doc fails the suite — the
  * can't-drift contract. */
class OperatorsDocSpec extends AnyFunSuite {

  private val rowRe = """\| (q\d+\S*) \| `([^`]+)` \|""".r.unanchored

  private def namesIn(md: String): Set[String] =
    md.linesIterator.collect { case rowRe(name, _) => name }.toSet

  test("render lists every registry query exactly once, with its file") {
    val md = OperatorsDoc.render()
    val names = md.linesIterator.collect {
      case rowRe(name, _) => name
    }.toVector
    assert(names.distinct == names, "no duplicate rows")
    assert(names.toSet == SparkEntry.queries.keySet)
    // file attribution: each row carries its declaring family's path
    val byFile = md.linesIterator.collect {
      case rowRe(name, file) => name -> file
    }.toMap
    for ((file, qs) <- SparkEntry.queryFamilies; q <- qs)
      assert(byFile(q.name) == file, s"${q.name} attributed to $file")
  }

  test("the committed docs/OPERATORS.md matches the registry (no drift)") {
    val p = java.nio.file.Paths.get("docs/OPERATORS.md")
    assert(java.nio.file.Files.exists(p),
      "docs/OPERATORS.md missing — run `sbt \"runMain graft.OperatorsDoc\"`")
    val committed = namesIn(java.nio.file.Files.readString(p))
    val registry = SparkEntry.queries.keySet
    assert(committed == registry,
      s"docs/OPERATORS.md drifted from the registry — regenerate it.\n" +
        s"missing from doc: ${(registry -- committed).toSeq.sorted}\n" +
        s"stale in doc: ${(committed -- registry).toSeq.sorted}")
  }
}
