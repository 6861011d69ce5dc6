package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{IvfTrain, Similarity}

/** The persisted IVF index is self-contained: assignment AND the
  * centroids that built it round-trip through storage, and a probe
  * against the reloaded pair answers exactly like the in-memory path.
  * Without persisted centroids a later session would re-derive its own —
  * probe geometry silently drifting from bucket contents. */
class IvfIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def embeddings = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("build + reload answers identically to the in-memory probe") {
    val dir = Files.createTempDirectory("graft-ivf-index").toString
    val trained = IvfTrain.train(embeddings, col("vec_id") % 64 === 0,
      iters = 2, "vec_id", "embedding")
    Similarity.buildIndex(embeddings, trained, dir)

    // "another session": everything below reads only from disk
    val reloaded = Similarity.readCentroids(spark, dir)
    assert(reloaded.map(_.id).toSeq == trained.map(_.id).toSeq)
    assert(reloaded.zip(trained).forall { case (a, b) =>
      a.vec.sameElements(b.vec) && a.norm == b.norm })

    val mem = Similarity.ivfTopK(embeddings, trained,
        col("vec_id") % 100 === 0, k = 3, nprobe = 2, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val disk = Similarity.ivfTopK(embeddings, reloaded,
        col("vec_id") % 100 === 0, k = 3, nprobe = 2, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(mem == disk && mem.nonEmpty)
  }

  test("incremental append equals a full rebuild (same centroids, same buckets)") {
    val dirFull = Files.createTempDirectory("graft-ivf-full").toString
    val dirIncr = Files.createTempDirectory("graft-ivf-incr").toString
    val cents = Similarity.collectCentroids(
      embeddings.filter(col("vec_id") % 64 === 0))
    // full build in one shot
    Similarity.buildIndex(embeddings, cents, dirFull)
    // incremental: first half builds, second half appends — the append
    // must assign with the index's PERSISTED centroids, not re-derive
    Similarity.buildIndex(embeddings.filter(col("vec_id") % 2 === 0),
      cents, dirIncr)
    Similarity.appendToIndex(embeddings.filter(col("vec_id") % 2 =!= 0),
      dirIncr)
    def contents(dir: String) = spark.read.parquet(dir)
      // partition inference reads the bucket directory names as int
      .select(col("vec_id"), col("bucket").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = contents(dirFull)
    assert(contents(dirIncr) == full && full.nonEmpty)

    // re-delivered ids are anti-joined away: an OVERLAPPING append must
    // not duplicate rows (a duplicate id would eat two of a probe's k
    // slots and evict a real neighbor)
    Similarity.appendToIndex(embeddings.filter(col("vec_id") < 100), dirIncr)
    assert(contents(dirIncr) == full)
    // the _ids manifest tracks the data exactly (distinct ids, buckets)
    val manifest = spark.read.parquet(s"$dirIncr/_ids")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(manifest == full)
  }

  test("compaction: one file per bucket, identical probes, manifest intact") {
    import scala.jdk.CollectionConverters._
    val dir = Files.createTempDirectory("graft-ivf-compact").toString
    val cents = Similarity.collectCentroids(
      embeddings.filter(col("vec_id") % 64 === 0))
    // build + two appends: touched buckets accumulate multiple files
    Similarity.buildIndex(embeddings.filter(col("vec_id") % 3 === 0),
      cents, dir)
    Similarity.appendToIndex(embeddings.filter(col("vec_id") % 3 === 1), dir)
    Similarity.appendToIndex(embeddings.filter(col("vec_id") % 3 === 2), dir)

    def bucketFiles(): Map[String, Int] = {
      val s = Files.list(java.nio.file.Paths.get(dir))
      try s.iterator().asScala
        .filter(_.getFileName.toString.startsWith("bucket="))
        .map { b =>
          val f = Files.list(b)
          try b.getFileName.toString ->
            f.iterator().asScala.count(_.toString.endsWith(".parquet"))
          finally f.close()
        }.toMap
      finally s.close()
    }
    assert(bucketFiles().values.exists(_ > 1), "fixture: no small files")
    val before = Similarity.ivfTopK(embeddings,
        Similarity.readCentroids(spark, dir),
        col("vec_id") % 100 === 0, k = 3, nprobe = 2, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

    Similarity.compactIndex(spark, dir)
    assert(bucketFiles().values.forall(_ == 1), s"not compacted: ${bucketFiles()}")
    // probes unchanged; centroids carried over; manifest regenerated so
    // a re-delivered batch is still rejected
    val after = Similarity.ivfTopK(embeddings,
        Similarity.readCentroids(spark, dir),
        col("vec_id") % 100 === 0, k = 3, nprobe = 2, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(after == before && after.nonEmpty)
    val n = spark.read.parquet(dir).count()
    Similarity.appendToIndex(embeddings.filter(col("vec_id") % 3 === 1), dir)
    assert(spark.read.parquet(dir).count() == n,
      "compaction lost the manifest: a replayed batch was re-admitted")

    // Leftover crash states fail fast at entry rather than being renamed
    // over: `.old` means a prior swap died (the recovery copy must not
    // be deleted by a retry), `.compacting` means a rewrite died or a
    // concurrent compaction is running.
    Files.createDirectory(java.nio.file.Paths.get(s"$dir.old"))
    val exOld = intercept[IllegalArgumentException] {
      Similarity.compactIndex(spark, dir)
    }
    assert(exOld.getMessage.contains(".old"))
    Files.delete(java.nio.file.Paths.get(s"$dir.old"))
    Files.createDirectory(java.nio.file.Paths.get(s"$dir.compacting"))
    val exTmp = intercept[IllegalArgumentException] {
      Similarity.compactIndex(spark, dir)
    }
    assert(exTmp.getMessage.contains(".compacting"))
    Files.delete(java.nio.file.Paths.get(s"$dir.compacting"))
  }

  test("append presence check reads the manifest, never the data files") {
    val dir = Files.createTempDirectory("graft-ivf-manifest").toString
    val cents = Similarity.collectCentroids(
      embeddings.filter(col("vec_id") % 64 === 0))
    Similarity.buildIndex(embeddings.filter(col("vec_id") % 2 === 0),
      cents, dir)
    // black-box proof: CORRUPT every data file in the index. If the
    // presence check (or anything else on the append path) touched a
    // data file, the append would crash on unreadable parquet; the
    // manifest path sails through.
    val corrupted = {
      val walk = Files.walk(java.nio.file.Paths.get(dir))
      try {
        val parts = new java.util.ArrayList[java.nio.file.Path]()
        walk.filter(p => p.toString.contains("bucket=") &&
            p.getFileName.toString.endsWith(".parquet"))
          .forEach(p => parts.add(p))
        parts.forEach(p =>
          Files.write(p, "not parquet anymore".getBytes("UTF-8")))
        parts.size()
      } finally walk.close()
    }
    assert(corrupted > 0, "fixture bug: no data files found to corrupt")
    // overlapping append: half re-delivered (rejected via manifest),
    // half genuinely new (admitted) — no data file is ever read
    Similarity.appendToIndex(embeddings, dir)
    val ids = spark.read.parquet(s"$dir/_ids").select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val all = embeddings.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ids == all)
  }

  test("a pre-manifest index is migrated on first append") {
    val dir = Files.createTempDirectory("graft-ivf-legacy").toString
    val cents = Similarity.collectCentroids(
      embeddings.filter(col("vec_id") % 64 === 0))
    Similarity.buildIndex(embeddings.filter(col("vec_id") % 2 === 0),
      cents, dir)
    // simulate an index written before the manifest existed
    val walk = Files.walk(java.nio.file.Paths.get(s"$dir/_ids"))
    try walk.sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.delete(p))
    finally walk.close()
    Similarity.appendToIndex(embeddings.filter(col("vec_id") % 2 =!= 0), dir)
    val ids = spark.read.parquet(s"$dir/_ids").select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids == embeddings.select("vec_id").collect()
      .map(_.getLong(0)).toSet)
  }

  test("the centroid table is invisible to the bucket data scan") {
    val dir = Files.createTempDirectory("graft-ivf-index2").toString
    val cents = Similarity.collectCentroids(
      embeddings.filter(col("vec_id") % 64 === 0))
    Similarity.buildIndex(embeddings, cents, dir)
    val probed = Similarity.readIndex(spark, dir, cents.take(2).map(_.id))
    // _centroids must not leak into the data schema or rows
    assert(!probed.columns.contains("centroid_id"))
    assert(probed.select("bucket").distinct().count() <= 2)
  }
}
