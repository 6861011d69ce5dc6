package graft.llm

import java.util.zip.CRC32

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Trainer-consumable token shards — the final-mile export a training
  * job actually reads (Megatron-LM's indexed dataset format family:
  * one flat binary file of fixed-width token ids per shard plus an
  * offset index; Shoeybi et al. 2019 describe the layout's purpose).
  * Everything upstream in this repo stops at relational pack/span
  * tables (q196); this operator materializes them: documents → BPE
  * token IDS (the q161 merge-replay segmentation) → per-shard `.bin`
  * (little-endian int32 tokens, concatenated in shard order) + `.idx`
  * (fixed 20-byte records: doc_id i64, start_tok i64, n_tokens i32) +
  * a checksum manifest certifying the bytes on storage — the
  * [[Sharding.writeShards]] read-back discipline.
  *
  * Layout contract: a shard holds the docs of one pack bucket in
  * ascending `doc_id` — the SAME order [[Packing.withPacksCounted]]'s
  * cumulative sum packs them, so pack boundaries are contiguous byte
  * ranges and q196-style span maps index into the `.bin` directly.
  * `start_tok` in the index is SHARD-global; byte offset = 4·tok.
  *
  * Scale shape: the vocabulary work (merge replay) runs over the
  * DISTINCT word set (census-class, never the corpus); the id sequence
  * assembly is one word-level join + one doc-keyed aggregation; the
  * writers are one task per shard with atomic temp-file renames (a
  * retried task overwrites its own output); the manifest is computed
  * from an executor-side READ-BACK of the written files, one task per
  * shard — nothing corpus-sized touches the driver. At 100 TB, raise
  * `nBuckets` until a shard fits a writer task. */
object TokenShards {

  /** Characters the BPE core splits to — initial vocabulary, ids 0-35. */
  private[llm] val CoreChars: IndexedSeq[String] =
    ("abcdefghijklmnopqrstuvwxyz0123456789").map(_.toString)

  /** Deterministic id table from a trained merge list: core characters
    * first (0-35), then each merge's joined symbol in rank order,
    * first occurrence winning (two merges CAN join to the same string —
    * (a,bc) and (ab,c) — and one symbol needs one id). Derived from the
    * merges alone, so the vocab ships with the tokenizer artifact
    * ([[Bpe.writeTokenizer]]) and never drifts from it. */
  def vocab(merges: Seq[BpeMerge]): Map[String, Int] = {
    val syms = CoreChars ++ merges.sortBy(_.rank).map(m => m.a + m.b)
    syms.distinct.zipWithIndex.toMap
  }

  /** docs(idCol, textCol) → (idCol, token_ids array<int>, tokens long):
    * each word segments by merge REPLAY ([[Bpe.segmentWithMerges]], the
    * apply step a tokenizer ships), symbols map through [[vocab]], and
    * the per-word id runs concatenate in word order. Wordless/null
    * texts get an empty sequence (0 tokens — the packing contract).
    * An out-of-vocab symbol is impossible by construction (replay emits
    * only core chars and merge joins) and therefore THROWS loudly. */
  def withTokenIds(docs: DataFrame, merges: Seq[BpeMerge],
                   idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    val v = vocab(merges)
    val idsU = udf { (syms: Seq[String]) =>
      if (syms == null) Seq.empty[Int]
      else syms.map(s => v.getOrElse(s,
        throw new IllegalStateException(
          s"TokenShards: symbol '$s' missing from the merge-derived " +
            "vocab — replay and vocab were built from different merges")))
    }
    val wp = graft.CacheBarriers.barrier(docs
      .select(col(idCol), posexplode(TextHash.words(col(textCol)))
        .as(Seq("pos", "w"))))
    val wordIds = Bpe.segmentWithMerges(wp.select(col("w")).distinct(), merges)
      .select(col("w"), idsU(col("syms")).as("ids"))
    val seqs = wp.join(wordIds, Seq("w"))
      .groupBy(col(idCol))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("pos"), col("ids")))),
        _.getField("ids"))).as("token_ids"))
    docs.select(col(idCol)).join(seqs, Seq(idCol), "left")
      .withColumn("token_ids",
        coalesce(col("token_ids"), lit(Array.empty[Int])))
      .withColumn("tokens", size(col("token_ids")).cast("long"))
  }

  /** Shard-global offset plan over [[withTokenIds]] output: pack
    * assignment ([[Packing.withPacksCounted]] — same salt, same next-fit
    * cumsum), then each doc's [start_tok, end_tok) within its shard
    * (= its pack bucket) and the int32 byte range. One window per
    * shard — parallelism is the shard count, exactly the downstream
    * writers' own parallelism. */
  def shardSpans(tokenized: DataFrame, budget: Int, nBuckets: Int,
                 idCol: String = "doc_id"): DataFrame = {
    val packed = Packing.withPacksCounted(tokenized, budget, nBuckets, idCol)
    val wShard = Window.partitionBy(col("bucket")).orderBy(col(idCol))
    val wPack = Window.partitionBy(col("pack_id")).orderBy(col(idCol))
    packed
      .withColumn("end_tok", sum(col("tokens")).over(
        wShard.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("start_tok", col("end_tok") - col("tokens"))
      .withColumn("doc_idx", row_number().over(wPack).cast("long") - 1L)
      .withColumn("shard", col("bucket").cast("long"))
      .withColumn("start_byte", col("start_tok") * BytesPerToken)
      .withColumn("end_byte", col("end_tok") * BytesPerToken)
  }

  /** int32 little-endian — the fixed token width of the `.bin` files. */
  val BytesPerToken: Int = 4
  /** Bytes per `.idx` record: doc_id i64 + start_tok i64 + n_tokens i32. */
  val IdxRecordBytes: Int = 20

  private def putLeInt(out: java.io.OutputStream, x: Int): Unit = {
    out.write(x & 0xff); out.write((x >> 8) & 0xff)
    out.write((x >> 16) & 0xff); out.write((x >> 24) & 0xff)
  }
  private def putLeLong(out: java.io.OutputStream, x: Long): Unit = {
    putLeInt(out, x.toInt); putLeInt(out, (x >> 32).toInt)
  }
  private[llm] def leInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private[llm] def leLong(b: Array[Byte], off: Int): Long =
    (leInt(b, off) & 0xffffffffL) | (leInt(b, off + 4).toLong << 32)

  /** Materialize the shards under `dir` (`shard=N.bin` / `shard=N.idx`)
    * and return the manifest — (shard, n_docs, n_tokens, bin_bytes,
    * crc32) — computed from an executor-side READ-BACK of the written
    * files, never from the frame that was supposed to land there (the
    * [[Sharding.writeShards]] discipline: the manifest certifies
    * storage). Writers stream doc-by-doc (no shard-sized buffering),
    * one task per shard via the shard repartition + in-task sort, with
    * temp-file + atomic-rename so a retried task replaces its own
    * partial output. */
  def writeTokenShards(docs: DataFrame, merges: Seq[BpeMerge], dir: String,
                       budget: Int, nBuckets: Int,
                       idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    val tokenized = withTokenIds(docs, merges, idCol, textCol)
    val spans = shardSpans(tokenized.select(col(idCol), col("tokens")),
        budget, nBuckets, idCol)
      .join(tokenized.select(col(idCol), col("token_ids")), Seq(idCol))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    spans.select(col("shard"), col(idCol).cast("long").as("__id"),
        col("start_tok"), col("token_ids"))
      .repartition(nBuckets, col("shard"))
      .sortWithinPartitions(col("shard"), col("__id"))
      .foreachPartition { (rows: Iterator[Row]) =>
        var cur = -1L
        var bin: java.io.OutputStream = null
        var idx: java.io.OutputStream = null
        var binTmp: java.nio.file.Path = null
        var idxTmp: java.nio.file.Path = null
        def closeShard(): Unit = if (cur >= 0) {
          bin.close(); idx.close()
          java.nio.file.Files.move(binTmp,
            java.nio.file.Paths.get(dir, s"shard=$cur.bin"),
            java.nio.file.StandardCopyOption.REPLACE_EXISTING,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          java.nio.file.Files.move(idxTmp,
            java.nio.file.Paths.get(dir, s"shard=$cur.idx"),
            java.nio.file.StandardCopyOption.REPLACE_EXISTING,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        }
        rows.foreach { r =>
          val shard = r.getLong(0)
          if (shard != cur) {
            closeShard()
            cur = shard
            binTmp = java.nio.file.Files.createTempFile(
              java.nio.file.Paths.get(dir), s"shard-$cur", ".bin.tmp")
            idxTmp = java.nio.file.Files.createTempFile(
              java.nio.file.Paths.get(dir), s"shard-$cur", ".idx.tmp")
            bin = new java.io.BufferedOutputStream(
              java.nio.file.Files.newOutputStream(binTmp))
            idx = new java.io.BufferedOutputStream(
              java.nio.file.Files.newOutputStream(idxTmp))
          }
          val ids = r.getSeq[Int](3)
          putLeLong(idx, r.getLong(1))
          putLeLong(idx, r.getLong(2))
          putLeInt(idx, ids.size)
          ids.foreach(putLeInt(bin, _))
        }
        closeShard()
      }
    manifest(spark, dir)
  }

  /** Checksum manifest from an executor-side READ-BACK of the shard
    * files — certifies the bytes on storage, not the frame that was
    * supposed to land there (the [[Sharding.writeShards]] discipline);
    * cross-checks `.idx` token totals against `.bin` length. */
  def manifest(spark: org.apache.spark.sql.SparkSession,
               dir: String): DataFrame = {
    val shardIds = {
      val d = new java.io.File(dir)
      Option(d.listFiles((_, n) =>
          n.startsWith("shard=") && n.endsWith(".bin")))
        .getOrElse(Array.empty)
        .map(_.getName.stripPrefix("shard=").stripSuffix(".bin").toLong)
        .sorted.toSeq
    }
    val manifestRows = spark.sparkContext
      .parallelize(shardIds, math.max(shardIds.size, 1))
      .map { shard =>
        val bin = java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(dir, s"shard=$shard.bin"))
        val ix = java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(dir, s"shard=$shard.idx"))
        require(ix.length % IdxRecordBytes == 0,
          s"shard=$shard.idx is torn: ${ix.length} bytes")
        val nDocs = ix.length / IdxRecordBytes
        val nTokens = (0 until nDocs)
          .map(i => leInt(ix, i * IdxRecordBytes + 16).toLong).sum
        require(nTokens * BytesPerToken == bin.length,
          s"shard=$shard: index claims $nTokens tokens but .bin holds " +
            s"${bin.length} bytes")
        val crc = new CRC32(); crc.update(bin)
        Row(shard, nDocs.toLong, nTokens, bin.length.toLong, crc.getValue)
      }.collect()
    spark.createDataFrame(
      java.util.Arrays.asList(manifestRows: _*),
      StructType(Seq(
        StructField("shard", LongType),
        StructField("n_docs", LongType),
        StructField("n_tokens", LongType),
        StructField("bin_bytes", LongType),
        StructField("crc32", LongType))))
  }

  /** Per-shard tail facts read from the `.idx` files (driver-side,
    * shard-count-sized): total tokens already exported and the last
    * exported doc id — what the incremental append continues from. */
  private def shardTails(spark: org.apache.spark.sql.SparkSession,
                         dir: String): Map[Long, (Long, Long)] = {
    val d = new java.io.File(dir)
    val files = Option(d.listFiles((_, n) =>
      n.startsWith("shard=") && n.endsWith(".idx"))).getOrElse(Array.empty)
    files.map { f =>
      val shard = f.getName.stripPrefix("shard=").stripSuffix(".idx").toLong
      val ix = java.nio.file.Files.readAllBytes(f.toPath)
      require(ix.length % IdxRecordBytes == 0,
        s"${f.getName} is torn: ${ix.length} bytes")
      val n = ix.length / IdxRecordBytes
      if (n == 0) shard -> ((0L, Long.MinValue))
      else {
        val last = (n - 1) * IdxRecordBytes
        val lastDoc = leLong(ix, last)
        val total = leLong(ix, last + 8) + leInt(ix, last + 16)
        shard -> ((total, lastDoc))
      }
    }.toMap
  }

  /** Incrementally APPEND a batch of new documents to an existing
    * export — the year-long-stream path beside
    * [[graft.streaming.BucketedState.compact]]: because
    * [[Packing.withPacksCounted]]'s cumulative sum orders each bucket by
    * ascending id, a batch whose ids all sort AFTER the exported ones
    * extends every shard strictly at its tail — existing pack
    * assignments, offsets, and bytes are never disturbed, so the shard
    * files are append-only and `append(A) then append(B) ≡ write(A∪B)`
    * BYTE-IDENTICAL (spec-pinned). The additive-batch id contract is
    * checked per touched shard against the `.idx` tail and violated
    * loudly (an out-of-order id would silently re-pack history).
    *
    * Crash safety per shard: the existing files copy to dot-prefixed
    * temps, the batch streams onto the copies, and the same checked
    * two-rename swap as [[graft.streaming.BucketedState.compact]]
    * replaces the live pair — O(shard bytes) per append, amortized by
    * batching (a true log-structured segment store would trade that for
    * read-side stitching; the flat `.bin` IS the trainer contract).
    * Untouched shards are not read, not copied, not written. */
  def appendTokenShards(newDocs: DataFrame, merges: Seq[BpeMerge],
                        dir: String, budget: Int, nBuckets: Int,
                        idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    val spark = newDocs.sparkSession
    val tails = shardTails(spark, dir)
    val tokenized = withTokenIds(newDocs, merges, idCol, textCol)
    val bucketed = tokenized.withColumn("bucket",
      TextHash.h32p(concat(lit(Packing.PackSalt), col(idCol).cast("string")))
        % nBuckets)
    // additive-batch guard, driver-side over shard-count rows
    val mins = bucketed.groupBy(col("bucket"))
      .agg(min(col(idCol).cast("long")).as("min_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    mins.foreach { case (b, minId) =>
      tails.get(b).filter(_._2 >= minId).foreach { case (_, lastDoc) =>
        throw new IllegalArgumentException(
          s"appendTokenShards: shard=$b already exported doc id $lastDoc" +
            s" >= incoming min id $minId — the append contract needs " +
            "every new id to sort after the exported ones, or the pack " +
            "cumsum would silently re-pack history; re-export instead")
      }
    }
    val priorTokens = tails.map { case (b, (tot, _)) => (b, tot) }
    val priorB = spark.sparkContext.broadcast(priorTokens)
    val priorCol = udf((b: Long) => priorB.value.getOrElse(b, 0L))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col(idCol))
    val spans = bucketed
      .withColumn("__cum", priorCol(col("bucket")) +
        sum(col("tokens")).over(w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
      .withColumn("start_tok", col("__cum") - col("tokens"))
      .withColumn("shard", col("bucket").cast("long"))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    spans.select(col("shard"), col(idCol).cast("long").as("__id"),
        col("start_tok"), col("token_ids"))
      .repartition(nBuckets, col("shard"))
      .sortWithinPartitions(col("shard"), col("__id"))
      .foreachPartition { (rows: Iterator[Row]) =>
        // Task-retry idempotence: a retried task may revisit a shard a
        // previous attempt already swapped — the live .idx tail then
        // already covers this batch's first id and the shard is SKIPPED
        // whole. A crash between the two swaps leaves the .old recovery
        // pair, which fails the retry loudly with instructions (the
        // compact discipline) — never a silent double-append.
        var cur = -1L
        var skip = false
        var bin: java.io.OutputStream = null
        var idx: java.io.OutputStream = null
        var binTmp: java.nio.file.Path = null
        var idxTmp: java.nio.file.Path = null
        def p(name: String) = java.nio.file.Paths.get(dir, name)
        def closeShard(): Unit = if (cur >= 0 && !skip) {
          bin.close(); idx.close()
          val names = Seq(s"shard=$cur.bin", s"shard=$cur.idx")
          names.foreach { n =>
            if (java.nio.file.Files.exists(p(n)))
              java.nio.file.Files.move(p(n), p(s".$n.old"),
                java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          }
          java.nio.file.Files.move(binTmp, p(names(0)),
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          java.nio.file.Files.move(idxTmp, p(names(1)),
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          names.foreach(n => java.nio.file.Files.deleteIfExists(p(s".$n.old")))
        }
        def lastExportedDoc(shard: Long): Long = {
          val liveIdx = p(s"shard=$shard.idx")
          if (!java.nio.file.Files.exists(liveIdx)) Long.MinValue
          else {
            val ix = java.nio.file.Files.readAllBytes(liveIdx)
            if (ix.length < IdxRecordBytes) Long.MinValue
            else leLong(ix, ix.length - IdxRecordBytes)
          }
        }
        def openShard(shard: Long, firstId: Long): Unit = {
          Seq(s"shard=$shard.bin", s"shard=$shard.idx").foreach { n =>
            require(!java.nio.file.Files.exists(p(s".$n.old")),
              s"$dir/.$n.old exists: a prior append crashed between its " +
                s"swaps. Recover shard=$shard by restoring the .old pair " +
                "over the live files, then retry.")
          }
          skip = lastExportedDoc(shard) >= firstId
          if (!skip) {
            binTmp = java.nio.file.Files.createTempFile(
              java.nio.file.Paths.get(dir), s"shard-$shard", ".bin.app")
            idxTmp = java.nio.file.Files.createTempFile(
              java.nio.file.Paths.get(dir), s"shard-$shard", ".idx.app")
            if (java.nio.file.Files.exists(p(s"shard=$shard.bin")))
              java.nio.file.Files.copy(p(s"shard=$shard.bin"), binTmp,
                java.nio.file.StandardCopyOption.REPLACE_EXISTING)
            if (java.nio.file.Files.exists(p(s"shard=$shard.idx")))
              java.nio.file.Files.copy(p(s"shard=$shard.idx"), idxTmp,
                java.nio.file.StandardCopyOption.REPLACE_EXISTING)
            bin = new java.io.BufferedOutputStream(java.nio.file.Files
              .newOutputStream(binTmp, java.nio.file.StandardOpenOption.APPEND))
            idx = new java.io.BufferedOutputStream(java.nio.file.Files
              .newOutputStream(idxTmp, java.nio.file.StandardOpenOption.APPEND))
          }
        }
        rows.foreach { r =>
          val shard = r.getLong(0)
          if (shard != cur) {
            closeShard(); cur = shard; openShard(shard, r.getLong(1))
          }
          if (!skip) {
            val ids = r.getSeq[Int](3)
            putLeLong(idx, r.getLong(1))
            putLeLong(idx, r.getLong(2))
            putLeInt(idx, ids.size)
            ids.foreach(putLeInt(bin, _))
          }
        }
        closeShard()
      }
    manifest(spark, dir)
  }

  /** Salt for the worker-rank hash — distinct from [[Packing.PackSalt]]
    * so pack bucketing and rank assignment stay independent streams. */
  private[llm] val RankSalt = "graft-rank-1:"

  /** Data-parallel loader plan: assign each PACK to a worker rank —
    * what a distributed training job needs next to the shards (every
    * rank must know its packs without coordination, and every run/
    * engine must agree). Assignment is a salted hash of the pack id
    * (`h32p(salt + pack_id) % nWorkers` — the [[Packing]] bucket
    * discipline): deterministic, coordination-free, and NO global sort
    * — a rank-balancing row_number over the pack table would be a
    * single-reducer window over corpus/budget rows at 100 TB; the hash
    * balances statistically and [[loaderBalance]] reports the achieved
    * imbalance as a number instead. Returns one row per pack:
    * (pack_id, shard, worker, n_docs, tok_sum). */
  def loaderPlan(packed: DataFrame, nWorkers: Int,
                 idCol: String = "doc_id"): DataFrame = {
    require(nWorkers > 0, s"nWorkers must be positive, got $nWorkers")
    packed.groupBy(col("bucket").cast("long").as("shard"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tokens")).as("tok_sum"))
      .withColumn("worker",
        TextHash.h32p(concat(lit(RankSalt), col("pack_id").cast("string")))
          % nWorkers)
      .select(col("pack_id"), col("shard"), col("worker"), col("n_docs"),
        col("tok_sum"))
  }

  /** SQL twin of [[loaderPlan]]'s worker assignment. */
  def sqlWorker(packId: String, nWorkers: Int): String =
    s"(${TextHash.sqlH32p(
      s"concat('$RankSalt', CAST($packId AS VARCHAR))")} % $nWorkers)"

  /** Per-worker balance census over a [[loaderPlan]]: pack/doc/token
    * totals and each worker's token share in exact integer
    * micro-fractions of the grand total — the report that says whether
    * the hash assignment is even enough or `nWorkers`/`budget` need
    * retuning (a rank with a fat share is the straggler every epoch).
    * Workers assigned no packs are absent by construction — the reader
    * compares row count to nWorkers. One config-sized aggregation. */
  def loaderBalance(plan: DataFrame): DataFrame = {
    val per = plan.groupBy(col("worker"))
      .agg(count(lit(1)).as("n_packs"), sum(col("n_docs")).as("n_docs"),
        sum(col("tok_sum")).as("tok_sum"))
    val tot = per.agg(sum(col("tok_sum")).as("__tot"))
    per.crossJoin(broadcast(tot))
      .withColumn("share_micro",
        expr("tok_sum * 1000000L DIV greatest(__tot, 1L)"))
      .drop("__tot")
  }

  /** Per-epoch read order over a [[loaderPlan]]: each worker visits its
    * packs in a deterministic pseudo-random order that RESHUFFLES every
    * epoch — [[Sharding.orderKey]] over the pack id, the repo's one
    * epoch-permutation convention (q80's shard discipline applied to
    * the loader side), so run N of epoch E on any engine reads the same
    * sequence. `seq` is the dense 0-based position within the worker;
    * the worker assignment itself never moves across epochs (that is
    * [[loaderPlan]]'s hash). One window per worker: parallelism = the
    * worker count, and each worker's list is manifest-sized
    * (packs/worker) — the list its loader materializes anyway. */
  def epochOrder(plan: DataFrame, epoch: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("worker")).orderBy(col("__ok"), col("pack_id"))
    plan.withColumn("__ok", Sharding.orderKey(col("pack_id"), epoch))
      .withColumn("seq", row_number().over(w).cast("long") - 1L)
      .drop("__ok")
  }

  /** Read one document's token ids back through the offsets — the
    * trainer's access path, used by the spec to pin bit-exactness. */
  def readDoc(dir: String, shard: Long, docId: Long): Seq[Int] = {
    val ix = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, s"shard=$shard.idx"))
    val n = ix.length / IdxRecordBytes
    val hit = (0 until n).find(i => leLong(ix, i * IdxRecordBytes) == docId)
      .getOrElse(throw new NoSuchElementException(
        s"doc $docId not in shard=$shard.idx"))
    val start = leLong(ix, hit * IdxRecordBytes + 8)
    val count = leInt(ix, hit * IdxRecordBytes + 16)
    val bin = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, s"shard=$shard.bin"))
    (0 until count).map(i =>
      leInt(bin, (start * BytesPerToken + i * BytesPerToken).toInt))
  }
}
