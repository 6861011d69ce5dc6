package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{Dedup, TextHash}

/** Run-over-run dedup: a new ingest batch deduped against the persisted
  * signature table of the existing corpus must find exactly the pairs the
  * full-batch run finds that touch a new doc — without re-signing the old
  * corpus. This is the artifact-reuse path the signature table exists
  * for. */
class IncrementalDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("incremental pairs == full-batch pairs touching the new docs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    // variants (truncated copies, +100000 ids) form near-dup pairs with
    // their originals; originals are the "existing" corpus, variants the
    // "new" ingest — every dup pair crosses the boundary
    val ws = TextHash.words(col("text"))
    val variants = docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
        concat_ws(" ", slice(ws, lit(1), size(ws) - 5)).as("text"))
    val all = docs.unionByName(variants)

    val full = Dedup.verifiedNearDupPairs(all)
      .select("id_a", "id_b", "inter", "uni")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = full.filter { case (a, b) => a >= 100000 || b >= 100000 }

    val existingSigned = Dedup.withSignature(docs)
      .select(col("doc_id"), col("sh"), col("bkeys"))
    val incremental = Dedup.incrementalNearDupPairs(variants, existingSigned)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(incremental == expected)
    assert(incremental.nonEmpty)
  }

  test("a re-delivered doc_id is represented by its NEW signature only") {
    import spark.implicits._
    // "existing" corpus: docs 1 and 2 are identical → a dup pair.
    // The new batch RE-DELIVERS doc 2 with completely different text and
    // adds doc 3 identical to the new 2. Correct output: exactly one
    // (2,3) pair from the fresh signatures; the stale 2-signature must
    // neither pair 2 with 1 nor duplicate any pair rows.
    val a = "the quick brown fox jumps over the lazy dog again and again"
    val b = "entirely different words about boats harbors tides and salt air"
    val existing = Seq((1L, a), (2L, a)).toDF("doc_id", "text")
    val newBatch = Seq((2L, b), (3L, b)).toDF("doc_id", "text")
    val existingSigned = Dedup.withSignature(existing)
      .select(col("doc_id"), col("sh"), col("bkeys"))
    val rows = Dedup.incrementalNearDupPairs(newBatch, existingSigned)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq == Seq((2L, 3L)), s"got ${rows.toSeq}")
  }
}
