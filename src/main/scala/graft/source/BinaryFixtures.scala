package graft.source

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

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
  * corpus — its parquet files' paths, sizes, and mtimes, cheap filesystem
  * metadata rather than a Spark aggregation, so a marker hit costs no
  * Spark job at all — and a regenerated parquet corpus (or two source
  * dirs whose names sanitize identically) invalidates the cache instead
  * of silently serving stale bytes against a fresh oracle. Generation
  * collects only the id + bytes projection of the sampled slice —
  * fixture-sized, not data-sized. */
object BinaryFixtures {

  /** Source dirs already signature-validated THIS JVM — even the
    * metadata walk is pure overhead once a run has checked a corpus
    * (the corpus cannot change under a running benchmark). */
  private val validated =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Filesystem-metadata signature of the source parquet (file or
    * directory): sorted `path|size|mtime` lines. Any rewrite of the
    * corpus changes sizes or mtimes and invalidates the fixture cache. */
  private def sourceSig(src: Path): String = {
    val walk = Files.walk(src)
    try {
      val entries = new java.util.ArrayList[String]()
      walk.filter(p => Files.isRegularFile(p))
        .forEach(p => entries.add(
          s"${p.toAbsolutePath}|${Files.size(p)}|${Files.getLastModifiedTime(p).toMillis}"))
      entries.sort(Comparator.naturalOrder[String]())
      String.join("\n", entries)
    } finally walk.close()
  }

  def ensure(spark: SparkSession, sfDir: String): String = {
    val out = Paths.get("target", "binfixtures",
      sfDir.replaceAll("[^A-Za-z0-9]", "_"))
    if (validated.contains(sfDir)) return out.toAbsolutePath.toString
    val marker = out.resolve("_SUCCESS")
    val sig = s"$sfDir\n${sourceSig(Paths.get(sfDir, "documents.parquet"))}"
    val fresh = Files.exists(marker) &&
      new String(Files.readAllBytes(marker), "UTF-8") == sig
    if (!fresh) {
      // wipe any stale generation before rewriting — depth-first via walk
      // so a stray subdirectory can't break the delete
      if (Files.exists(out)) {
        val walk = Files.walk(out)
        try walk.sorted(Comparator.reverseOrder[Path]())
          .forEach(p => Files.delete(p))
        finally walk.close()
      }
      Files.createDirectories(out)
      spark.read.parquet(s"$sfDir/documents.parquet")
        .filter(col("doc_id") % 10 === 0)
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
