package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Registry for operator-internal materialization barriers.
  *
  * Several batch operators persist an intermediate frame the returned
  * (lazy) frame depends on — the measured signature/gram barriers in
  * [[graft.llm.Dedup]], [[graft.llm.Curation]], [[graft.llm.LangModel]].
  * The operator cannot unpersist inside the call (the consumer has not run
  * yet), and the caller never sees the frame, so in a long-lived session
  * repeated calls accrete cached tables with no release lever short of
  * `spark.sharedState.cacheManager.clearCache()` — which also nukes caches
  * the USER owns. Operators register such barriers here; a session that
  * has consumed the returned frames calls [[releaseAll]] between rounds
  * (what a scheduled ingest loop should do after each batch commits).
  *
  * Frames whose persist is part of the public contract (e.g.
  * [[graft.llm.Dedup.signCorpus]], which returns the barrier for the
  * caller — and the streaming twins — to unpersist per batch) are NOT
  * registered: their release is the caller's, and releaseAll yanking them
  * mid-stream would break the contract.
  */
object CacheBarriers {

  private val reg = new ConcurrentLinkedQueue[Dataset[_]]()

  /** Persist `ds` at `level` and register it for [[releaseAll]]. A frame
    * the CALLER already persisted is left alone and NOT registered —
    * its cache belongs to the caller, and releaseAll yanking it would
    * break the caller's own barrier contract. */
  def barrier[T](ds: Dataset[T],
                 level: StorageLevel = StorageLevel.MEMORY_AND_DISK): Dataset[T] = {
    if (ds.storageLevel == StorageLevel.NONE) {
      ds.persist(level)
      reg.add(ds)
    }
    ds
  }

  /** Unpersist every registered barrier (non-blocking) and forget them.
    * Returns how many were released. Safe to call while nothing is
    * running; frames still needed by an un-consumed lazy result simply
    * recompute (correctness is unaffected — only the measured
    * re-evaluation cost returns). */
  def releaseAll(): Int = {
    var n = 0
    var ds = reg.poll()
    while (ds != null) {
      ds.unpersist(false)
      n += 1
      ds = reg.poll()
    }
    n
  }
}
