package graft.source

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deterministic on-disk binary corpus for exercising the S7 /
  * multimodal paths against REAL bytes through the real
  * `binaryFile` source (not text cast to binary): every 10th document
  * becomes `doc_<id>.bin` whose content is `unhex(repeat(md5(text),
  * (doc_id div 10) % 4 + 1))` — 16/32/48/64 raw non-UTF-8 bytes (the
  * repeat factor derives from `doc_id div 10` because the sampled ids
  * are all even, so `doc_id % 4` alone would only ever produce the
  * 16/48-byte variants), reproducible
  * from the parquet corpus by any engine (the DuckDB oracle rebuilds the
  * same bytes with the same expression, no filesystem needed).
  *
  * Files land under `target/binfixtures/<sanitized sf dir>` and are
  * written once; the `_SUCCESS` marker records a signature of the SOURCE
  * corpus (row count + id/byte-length sums), so a regenerated parquet
  * corpus — or two source dirs whose names sanitize identically —
  * invalidates the cache instead of silently serving stale bytes against
  * a fresh oracle. Generation collects only the id + bytes projection of
  * the sampled slice — fixture-sized, not data-sized. */
object BinaryFixtures {

  /** Source dirs already signature-validated THIS JVM — the per-call
    * freshness aggregate is pure overhead once a run has checked a
    * corpus (the corpus cannot change under a running benchmark). */
  private val validated =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def ensure(spark: SparkSession, sfDir: String): String = {
    val out = Paths.get("target", "binfixtures",
      sfDir.replaceAll("[^A-Za-z0-9]", "_"))
    if (validated.contains(sfDir)) return out.toAbsolutePath.toString
    val marker = out.resolve("_SUCCESS")
    val sampled = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") % 10 === 0)
    val sigRow = sampled
      .agg(count(lit(1)), coalesce(sum(col("doc_id")), lit(0L)),
        coalesce(sum(length(col("text"))), lit(0L)))
      .collect()(0)
    val sig = s"$sfDir|${sigRow.getLong(0)}|${sigRow.getLong(1)}|${sigRow.getLong(2)}"
    val fresh = Files.exists(marker) &&
      new String(Files.readAllBytes(marker), "UTF-8") == sig
    if (!fresh) {
      // wipe any stale generation before rewriting
      if (Files.exists(out)) {
        val stale = Files.list(out)
        try stale.forEach(p => Files.delete(p))
        finally stale.close()
      }
      Files.createDirectories(out)
      sampled
        .select(col("doc_id").cast("long"),
          unhex(expr("repeat(md5(text), CAST((doc_id div 10) % 4 + 1 AS INT))"))
            .as("bytes"))
        .collect()
        .foreach { r =>
          Files.write(out.resolve(s"doc_${r.getLong(0)}.bin"),
            r.getAs[Array[Byte]]("bytes"))
        }
      Files.write(marker, sig.getBytes("UTF-8"))
    }
    validated.add(sfDir)
    out.toAbsolutePath.toString
  }
}
