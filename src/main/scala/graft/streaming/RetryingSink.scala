package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sink-side error handling (T7): the reference pauses intake and backs
  * off exponentially from 1 minute to a 1 hour cap when bulk writes fail
  * (`afterBulk` monstache.go:559-632, policy 5382-5383), never silently
  * shedding indexed data (it *does* shed relate work under overload,
  * 3397-3401 — deliberately NOT ported; Spark queues instead).
  *
  * [[RetryingSink.withRetry]] wraps a foreachBatch body: transient
  * failures retry with exponential backoff; exhausting retries rethrows so
  * the streaming query fails loudly and the checkpoint replays the batch —
  * at-least-once preserved, no holes (flush-before-save, T2). */
object RetryingSink {

  /** Exponential backoff schedule: base, base*2, ... capped. The
    * reference's defaults are 1 min → 1 h; tests inject millis. */
  def backoffMillis(attempt: Int, baseMs: Long = 60000L,
                    capMs: Long = 3600000L): Long =
    math.min(capMs, baseMs * (1L << math.min(attempt, 30)))

  /** Run `write`, retrying transient failures up to `maxRetries` with
    * exponential backoff. Only non-fatal errors retry: a fatal error
    * (OutOfMemoryError, linkage...) must kill the task immediately, not
    * sleep through an hour-long backoff on a dying executor, and an
    * interrupt (task kill / query stop) restores the flag and rethrows so
    * cancellation is never swallowed. */
  def withRetry[T](maxRetries: Int, baseMs: Long = 60000L,
                   capMs: Long = 3600000L,
                   sleep: Long => Unit = Thread.sleep)(write: => T): T = {
    var attempt = 0
    while (true) {
      try return write
      catch {
        case e: InterruptedException =>
          Thread.currentThread().interrupt()
          throw e
        case scala.util.control.NonFatal(_) if attempt < maxRetries => ()
      }
      // the backoff sleep runs OUTSIDE the catch: the thread spends
      // nearly all its time here, so an interrupt (task kill / query
      // stop) usually lands in the sleep — it must restore the flag and
      // rethrow too, or cooperative cancellation upstream misses it
      try sleep(backoffMillis(attempt, baseMs, capMs))
      catch {
        case e: InterruptedException =>
          Thread.currentThread().interrupt()
          throw e
      }
      attempt += 1
    }
    throw new IllegalStateException("unreachable")
  }

  /** A3/K5: bulk-stats counters as observed metrics — the streaming twin
    * of the reference's per-flush stats doc (`nextStats`
    * monstache.go:4959-4972): rows, upserts, deletes per batch, readable
    * from the query progress (observedMetrics) or a listener, with zero
    * extra passes over the data. */
  def withBulkStats(df: DataFrame, name: String = "bulk_stats"): DataFrame =
    df.observe(name,
      count(lit(1)).as("ops"),
      count(when(col("operation") === "d", 1)).as("deleted"),
      count(when(col("operation").isin("i", "u"), 1)).as("indexed"),
      max(col("version")).as("max_version"))
}
