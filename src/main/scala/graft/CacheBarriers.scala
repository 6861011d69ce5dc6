package graft

import java.util.concurrent.ConcurrentLinkedQueue

import scala.util.DynamicVariable

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** One owner's set of registered barriers. Obtained via
  * [[CacheBarriers.withScope]]; released as a unit without touching any
  * other owner's barriers. */
final class BarrierScope private[graft] () {
  private val reg = new ConcurrentLinkedQueue[Dataset[_]]()

  private[graft] def add(ds: Dataset[_]): Unit = reg.add(ds)

  /** Unpersist every barrier registered in this scope (non-blocking) and
    * forget them. Returns how many were released. */
  def release(): Int = {
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

/** Registry for operator-internal materialization barriers.
  *
  * Several batch operators persist an intermediate frame the returned
  * (lazy) frame depends on — the measured signature/gram barriers in
  * [[graft.llm.Dedup]], [[graft.llm.Curation]], [[graft.llm.LangModel]].
  * The operator cannot unpersist inside the call (the consumer has not run
  * yet), and the caller never sees the frame, so in a long-lived session
  * repeated calls accrete cached tables with no release lever short of
  * `spark.sharedState.cacheManager.clearCache()` — which also nukes caches
  * the USER owns. Operators register such barriers here.
  *
  * Ownership: [[releaseAll]] drains the SESSION-GLOBAL registry — it is
  * the between-rounds lever for a session that owns everything running in
  * it (a bench loop, a scheduled single-pipeline ingest), and it is NOT
  * safe to call from one of several concurrent pipelines: it would
  * unpersist the other pipelines' in-flight barriers (correctness holds —
  * plans recompute — but their caching contract silently degrades). A
  * pipeline that releases per-batch while sharing the session wraps its
  * batch work in [[withScope]] instead: barriers registered by operators
  * called inside the block land in that scope and are released as a unit,
  * leaving every other owner's barriers alone
  * ([[graft.streaming.StreamingCuration]] does this per micro-batch).
  *
  * Frames whose persist is part of the public contract (e.g.
  * [[graft.llm.Dedup.signCorpus]], which returns the barrier for the
  * caller — and the streaming twins — to unpersist per batch) are NOT
  * registered: their release is the caller's, and releaseAll yanking them
  * mid-stream would break the contract.
  */
object CacheBarriers {

  private val global = new BarrierScope

  /** Scope receiving registrations on the current thread; defaults to the
    * session-global scope. DynamicVariable rides an
    * InheritableThreadLocal, so operator calls made on the scoping thread
    * (where plan construction — and thus registration — happens) resolve
    * the right scope even under foreachBatch's dedicated thread. */
  private val current = new DynamicVariable[BarrierScope](global)

  /** Persist `ds` at `level` and register it with the current scope (the
    * session-global one unless inside [[withScope]]). A frame the CALLER
    * already persisted is left alone and NOT registered — its cache
    * belongs to the caller, and a scope release yanking it would break
    * the caller's own barrier contract. */
  def barrier[T](ds: Dataset[T],
                 level: StorageLevel = StorageLevel.MEMORY_AND_DISK): Dataset[T] = {
    if (ds.storageLevel == StorageLevel.NONE) {
      ds.persist(level)
      current.value.add(ds)
    }
    ds
  }

  /** Run `body` with a fresh [[BarrierScope]] capturing every barrier
    * registered on this thread, then release them. Use when the block
    * fully consumes its operators' results (everything on storage /
    * collected) before returning — the per-micro-batch shape. */
  def withScope[A](body: => A): A = {
    val scope = new BarrierScope
    try current.withValue(scope)(body)
    finally scope.release()
  }

  /** Unpersist every barrier in the SESSION-GLOBAL scope (non-blocking)
    * and forget them. Returns how many were released. Safe only when this
    * caller owns the whole session (see class doc); concurrent pipelines
    * must use [[withScope]]. Frames still needed by an un-consumed lazy
    * result simply recompute (correctness is unaffected — only the
    * measured re-evaluation cost returns). */
  def releaseAll(): Int = global.release()
}
