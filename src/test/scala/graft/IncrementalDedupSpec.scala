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
}
