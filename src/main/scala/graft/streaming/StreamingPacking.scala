package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.llm.{Packing, TextHash}

/** Per-bucket packing state: the running token total — everything the
  * next-fit rule needs to place the next document — plus the (budget,
  * nBuckets) pair the state was built under, so a restart with different
  * parameters fails loudly instead of silently packing against token
  * totals from another partitioning (the same hazard BucketedState pins
  * with its `_meta` marker; here the pin rides the checkpointed state —
  * a bucket that never carried state cannot detect the change, but every
  * bucket whose totals would actually corrupt placement does). */
case class PackBucketState(cumTokens: Long, budget: Int, nBuckets: Int)

/** One packed document: the id, its token count, its scatter bucket, and
  * the pack it joined. */
case class PackedDoc(doc_id: Long, tokens: Int, bucket: Long, pack_id: Long)

/** Streaming twin of [[graft.llm.Packing]] (sequence packing). The batch
  * form packs with a per-bucket cumsum window — but a window only sees one
  * batch, and a pack that is half-full when a micro-batch ends must keep
  * filling from the next one. So the running token total per bucket lives
  * in keyed state (`flatMapGroupsWithState`, checkpointed with the
  * query), and each arriving document is placed exactly where the batch
  * rule would put it: pack `floor(tokens_before / budget)`.
  *
  * Parity contract: streamed packs equal batch packs when documents
  * arrive in id order (the batch window's order). Out-of-order arrival
  * packs by arrival — the same trust-the-stream behavior as the patch
  * log; within one micro-batch, ids are re-sorted so intra-batch order
  * never depends on shuffle nondeterminism.
  *
  * Scale: state is one long per bucket (`nBuckets` keys total — bounded
  * and tiny); the stateful shuffle is on the bucket key, the same
  * partitioning the batch window uses.
  */
object StreamingPacking {

  /** Pack a stream of (doc_id, text). Append-mode output. */
  def packs(docs: Dataset[(Long, String)], budget: Int,
            nBuckets: Int): Dataset[PackedDoc] = {
    import docs.sparkSession.implicits._
    docs
      .map { case (id, text) =>
        val tokens = TextHash.wordsScala(text).length
        val bucket =
          TextHash.h32pScala(Packing.PackSalt + id.toString) % nBuckets
        (id, tokens, bucket)
      }
      .groupByKey(_._3)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(
        (bucket: Long, rows: Iterator[(Long, Int, Long)],
         state: GroupState[PackBucketState]) => {
          val prev = state.getOption
          prev.foreach { s =>
            require(s.budget == budget && s.nBuckets == nBuckets,
              s"packing state was built with budget=${s.budget}, " +
                s"nBuckets=${s.nBuckets}; restarting with budget=$budget, " +
                s"nBuckets=$nBuckets would place documents against token " +
                "totals of a different partitioning — pass the original " +
                "values (or start a fresh checkpoint)")
          }
          val ordered = rows.toArray.sortBy(_._1)
          var cum = prev.map(_.cumTokens).getOrElse(0L)
          val out = ordered.map { case (id, tokens, b) =>
            // integer division == floor for the non-negative running sum;
            // identical to the batch rule floor((cum_after - tokens)/budget)
            val pack = b * Packing.PackStride + cum / budget
            cum += tokens
            PackedDoc(id, tokens, b, pack)
          }
          state.update(PackBucketState(cum, budget, nBuckets))
          out.iterator
        })
  }
}
