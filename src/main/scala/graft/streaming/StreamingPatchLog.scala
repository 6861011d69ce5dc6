package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.codec.JsonMergePatch
import graft.source.ChangeEvent

/** Per-key patch-log state: how many patches exist and the last document
  * seen — the streaming stand-in for the reference's "GET previous doc
  * from Elasticsearch" (addPatch, monstache.go:3084-3158). */
case class PatchState(v: Int, lastDoc: String)

/** One emitted patch: the full (namespace, id) key, its 1-based patch
  * number, the RFC-7386 merge patch (v1 = the canonical full doc), and
  * the source op's version for downstream ordering. The namespace rides
  * along because ids recur across collections (sequential integer _ids
  * are the norm) — an id-only log would interleave unrelated chains for
  * any consumer, exactly what the batch twin's namespace column
  * prevents. */
case class PatchEntry(namespace: String, id: String, v: Int, patch: String,
                      version: Long)

/** Streaming twin of the JSON merge-patch log (P10). The batch form
  * ([[graft.operators.PatchLog]]) pairs each doc with its predecessor via
  * `lag()` — but a window only sees one batch. Continuously, the previous
  * doc per key must OUTLIVE the micro-batch, so it lives in keyed state
  * (`flatMapGroupsWithState`, checkpointed with the query): each arriving
  * op diffs against the state's last doc, emits its patch, and becomes
  * the new last doc — exactly the reference's per-op addPatch cycle with
  * the ES round-trip replaced by the engine's own state store.
  *
  * Ordering: ops within a micro-batch are applied in (version, event_id)
  * order; across batches arrival order is trusted, which is the
  * reference's behavior too (it diffs against whatever the sink holds at
  * op time — a late-arriving old op produces a "backwards" patch there as
  * well). At scale, state is per-key-tiny (one doc + a counter) and the
  * RocksDB store shards it by key; bound it in production with a
  * watermark + state TTL when key cardinality is unbounded.
  */
object StreamingPatchLog {

  /** Patches for data ops of the given patch-namespaces
    * (`patch-namespaces`, monstache.go:2833-2835). Append-mode output.
    * Deletes flow through as state RESETS (a delete removes the sink doc
    * and its patch array, so the next insert starts a fresh chain at
    * v1 = the full doc — the same delete-epoch fence as the batch twin),
    * emitting nothing themselves. */
  def patches(events: Dataset[ChangeEvent],
              namespaces: Seq[String]): Dataset[PatchEntry] = {
    import events.sparkSession.implicits._
    val nsSet = namespaces.toSet
    events
      .filter(e => nsSet.contains(e.namespace) &&
        (((e.operation == "i" || e.operation == "u") && e.document != null)
          || e.operation == "d"))
      // state per (namespace, id): patch chains are per collection, like
      // the batch twin's window partitioning
      .groupByKey(e => (e.namespace, e.id))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (key: (String, String), ops: Iterator[ChangeEvent],
         state: GroupState[PatchState]) => {
          val (ns, id) = key
          val ordered = ops.toArray.sortBy(e => (e.version, e.event_id))
          var st = state.getOption.getOrElse(PatchState(0, null))
          val out = ordered.flatMap { e =>
            if (e.operation == "d") {
              st = PatchState(0, null)
              None
            } else {
              val patch =
                if (st.lastDoc == null) JsonMergePatch.canonicalJson(e.document)
                else JsonMergePatch.diff(st.lastDoc, e.document)
              st = PatchState(st.v + 1, e.document)
              Some(PatchEntry(ns, id, st.v, patch, e.version))
            }
          }
          state.update(st)
          out.iterator
        })
  }
}
