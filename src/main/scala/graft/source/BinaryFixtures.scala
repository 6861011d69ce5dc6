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
  * written once (`_SUCCESS` marker); generation collects only the id +
  * bytes projection of the sampled slice — fixture-sized, not
  * data-sized. */
object BinaryFixtures {

  def ensure(spark: SparkSession, sfDir: String): String = {
    val out = Paths.get("target", "binfixtures",
      sfDir.replaceAll("[^A-Za-z0-9]", "_"))
    val marker = out.resolve("_SUCCESS")
    if (!Files.exists(marker)) {
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
      Files.write(marker, Array.emptyByteArray)
    }
    out.toAbsolutePath.toString
  }
}
