package graft.llm

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The trainer-consumable binary export: merge-derived vocab, token-id
  * assembly, shard-global offsets, and the .bin/.idx/manifest files —
  * pinned by reading documents back BIT-EXACT through the offsets. */
class TokenShardsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("vocab: core chars 0-35, merge symbols in rank order, dedup'd") {
    val merges = Seq(BpeMerge(1, "a", "b", 5), BpeMerge(2, "ab", "c", 3),
      BpeMerge(3, "a", "bc", 2)) // (ab,c) and (a,bc) both join to "abc"
    val v = TokenShards.vocab(merges)
    assert(v("a") == 0 && v("b") == 1 && v("z") == 25 && v("0") == 26 &&
      v("9") == 35)
    assert(v("ab") == 36 && v("abc") == 37, "first occurrence wins")
    assert(v.size == 38)
  }

  test("withTokenIds: replayed ids in word order; empty/null texts = 0") {
    import spark.implicits._
    // merges: (a,b)->ab id 36, (ab,a)->aba id 37
    val merges = Seq(BpeMerge(1, "a", "b", 9), BpeMerge(2, "ab", "a", 4))
    val docs = Seq(
      (1L, "aba cab"),         // aba -> [37]; cab -> [c, ab] = [2, 36]
      (2L, "b?!a"),            // one word, core chars only: [1, 0]
      (3L, ""),                // wordless
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = TokenShards.withTokenIds(docs, merges)
      .orderBy("doc_id").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(got(0).getSeq[Int](1) == Seq(37, 2, 36))
    assert(got(0).getLong(2) == 3L)
    assert(got(1).getSeq[Int](1) == Seq(1, 0))
    assert(got(2).getSeq[Int](1).isEmpty && got(2).getLong(2) == 0L)
    assert(got(3).getSeq[Int](1).isEmpty && got(3).getLong(2) == 0L)
  }

  test("shardSpans: shard-global contiguous spans, int32 byte algebra") {
    import spark.implicits._
    val tokenized = (0L until 40L).map(i => (i, (i % 5) + 1)).toDF("doc_id", "tokens")
    val spans = TokenShards.shardSpans(tokenized, budget = 8, nBuckets = 4)
      .orderBy("shard", "doc_id").collect()
    // within a shard, spans tile [0, total) with no gap or overlap
    spans.groupBy(_.getAs[Long]("shard")).foreach { case (_, ss) =>
      var expect = 0L
      ss.foreach { r =>
        assert(r.getAs[Long]("start_tok") == expect)
        expect = r.getAs[Long]("end_tok")
        assert(r.getAs[Long]("start_byte") ==
          r.getAs[Long]("start_tok") * 4)
        assert(r.getAs[Long]("end_byte") == r.getAs[Long]("end_tok") * 4)
      }
    }
    // pack ids are monotone in doc order within a shard: pack boundaries
    // are contiguous byte ranges (the layout contract)
    spans.groupBy(_.getAs[Long]("shard")).foreach { case (_, ss) =>
      val packs = ss.map(_.getAs[Long]("pack_id")).toSeq
      assert(packs == packs.sorted)
    }
  }

  test("write + read back: every document bit-exact through the offsets") {
    import spark.implicits._
    val docs = spread((0L until 60L).map(i =>
      (i, s"doc$i ab${"c" * (i % 7).toInt} the quick ${i}fox"))
      .toDF("doc_id", "text"))
    val (merges, _) = Bpe.train(Bpe.wordCensus(docs), nMerges = 6)
    val dir = Files.createTempDirectory("graft-tokshards").toString
    val manifest = TokenShards.writeTokenShards(docs, merges, dir,
      budget = 32, nBuckets = 3)

    val expected = TokenShards.withTokenIds(docs, merges)
    val spans = TokenShards.shardSpans(
      expected.select(col("doc_id"), col("tokens")), budget = 32,
      nBuckets = 3)
    val byDoc = expected.select("doc_id", "token_ids").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val shardOf = spans.select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    // bit-exact: every doc read back through .idx offsets into .bin
    (0L until 60L).foreach { id =>
      assert(TokenShards.readDoc(dir, shardOf(id), id) == byDoc(id),
        s"doc $id corrupted through the binary round-trip")
    }

    // the manifest certifies storage: totals match the relational truth
    val m = manifest.collect()
    assert(m.map(_.getLong(1)).sum == 60L, "every doc in exactly one shard")
    assert(m.map(_.getLong(2)).sum == byDoc.values.map(_.size.toLong).sum)
    m.foreach { r =>
      assert(r.getLong(3) == r.getLong(2) * TokenShards.BytesPerToken)
    }

    // a re-export overwrites atomically and certifies the same bytes
    val again = TokenShards.writeTokenShards(docs, merges, dir,
      budget = 32, nBuckets = 3).collect()
    assert(again.map(r => (r.getLong(0), r.getLong(4))).toSeq.sorted ==
      m.map(r => (r.getLong(0), r.getLong(4))).toSeq.sorted,
      "replayed export must produce identical checksums")
  }

  test("append(B) after write(A) is byte-identical to write(A + B)") {
    import spark.implicits._
    val mk = (r: Range) => spread(r.map(i =>
      (i.toLong, s"w$i ab${"c" * (i % 5)} xyz ${i}q")).toDF("doc_id", "text"))
    val all = mk(0 until 80)
    // frozen tokenizer: the SAME merge table drives both paths (an
    // append never retrains — the q161 replay contract)
    val (merges, _) = Bpe.train(Bpe.wordCensus(all), nMerges = 5)

    val dirFull = Files.createTempDirectory("graft-tok-full").toString
    val mFull = TokenShards.writeTokenShards(all, merges, dirFull,
      budget = 24, nBuckets = 3).collect()

    val dirInc = Files.createTempDirectory("graft-tok-inc").toString
    TokenShards.writeTokenShards(mk(0 until 50), merges, dirInc,
      budget = 24, nBuckets = 3)
    val mInc = TokenShards.appendTokenShards(mk(50 until 80), merges,
      dirInc, budget = 24, nBuckets = 3).collect()

    // CRC equality per shard = the bytes are identical: the append
    // extended every shard strictly at its tail
    def key(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sortBy(_._1).toSeq
    assert(key(mInc) == key(mFull),
      s"incremental export diverged:\nfull ${key(mFull)}\ninc  ${key(mInc)}")

    // an out-of-order batch (ids at or below the exported tail) is a
    // loud contract violation, never a silent re-pack
    val e = intercept[IllegalArgumentException](
      TokenShards.appendTokenShards(mk(40 until 60), merges, dirInc,
        budget = 24, nBuckets = 3))
    assert(e.getMessage.contains("sort after"))
  }

  test("loaderPlan/loaderBalance: coordination-free ranks, exact census") {
    import spark.implicits._
    val tokenized = (0L until 200L).map(i => (i, (i % 9) + 1))
      .toDF("doc_id", "tokens")
    val packed = Packing.withPacksCounted(tokenized, budget = 16,
      nBuckets = 4)
    val plan = TokenShards.loaderPlan(packed, nWorkers = 3).collect()
    // every pack exactly once, workers in range, assignment deterministic
    assert(plan.map(_.getAs[Long]("pack_id")).distinct.length == plan.length)
    assert(plan.forall(r => (0L until 3L).contains(r.getAs[Long]("worker"))))
    val again = TokenShards.loaderPlan(packed, nWorkers = 3).collect()
    assert(plan.map(r => (r.getAs[Long]("pack_id"),
      r.getAs[Long]("worker"))).sorted.toSeq ==
      again.map(r => (r.getAs[Long]("pack_id"),
        r.getAs[Long]("worker"))).sorted.toSeq)

    val bal = TokenShards.loaderBalance(
      TokenShards.loaderPlan(packed, nWorkers = 3)).collect()
    // census conserves the corpus and shares tile ~1e6 (truncating div)
    val totalTokens = 200L / 9 * (1 to 9).sum +
      (1 to (200 % 9).toInt).map(_.toLong).sum
    assert(bal.map(_.getAs[Long]("tok_sum")).sum == totalTokens)
    val shares = bal.map(_.getAs[Long]("share_micro")).sum
    assert(shares <= 1000000L && shares > 1000000L - 3)
  }

  test("epochOrder: per-epoch permutation, stable workers, dense seq") {
    import spark.implicits._
    val tokenized = (0L until 300L).map(i => (i, (i % 7) + 1))
      .toDF("doc_id", "tokens")
    val plan = TokenShards.loaderPlan(
      Packing.withPacksCounted(tokenized, budget = 16, nBuckets = 4),
      nWorkers = 3)
    def order(epoch: Int) = TokenShards.epochOrder(plan, epoch)
      .select("worker", "seq", "pack_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val e1 = order(1)
    // seq is dense 0..n-1 within each worker
    e1.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (0L until rows.length).toSeq)
    }
    // deterministic: same epoch, same order
    assert(order(1).toSeq == e1.toSeq)
    // a new epoch permutes at least one worker's visit order...
    val e2 = order(2)
    val visit = (es: Array[(Long, Long, Long)]) =>
      es.groupBy(_._1).map { case (w, r) =>
        w -> r.sortBy(_._2).map(_._3).toSeq }
    assert(visit(e1) != visit(e2), "epoch must reshuffle the read order")
    // ...but never moves a pack between workers (loaderPlan's hash)
    assert(e1.map(r => (r._3, r._1)).sorted.toSeq ==
      e2.map(r => (r._3, r._1)).sorted.toSeq)
  }

  private def spread(df: org.apache.spark.sql.DataFrame) = df.repartition(4)
}
