package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The rejects channel (SURVEY §2.9 parity gap, round-13 verdict): the
  * reference NEVER drops an op silently — a doc op with an empty or
  * oversized `_id` is skipped WITH an error log (monstache.go:3167-3171)
  * and every sink-side bulk reject flows through `processErr` into a
  * visible error index (monstache.go:3493-3508). The Spark analog is a
  * `reject_reason` column: null = accepted; a FATAL reason (the op can
  * never be indexed — no usable id) removes the op from every sink-bound
  * flow; an advisory reason (`oversized_file`: the op indexes, just
  * without content, monstache.go:1425-1429) rides along for visibility.
  * [[graft.sink.SinkWriter.writeBatch]] routes every tagged row to
  * [[graft.sink.SinkBackend.quarantine]] — the errors frame an operator
  * alerts on.
  *
  * Scale shape: pure column algebra (codegen'd, no UDF); the quarantine
  * frame is reject-sized, not batch-sized. */
object Quarantine {

  /** Doc op with a null/empty id — unkeyable (monstache.go:3167). */
  val EmptyId = "empty_id"
  /** Doc op whose id exceeds the 512-byte sink key cap (3169-3171). */
  val OversizedId = "oversized_id"
  /** File-namespace op whose content exceeds `max-file-size`: the op
    * still indexes, without content (monstache.go:1425-1429). */
  val OversizedFile = "oversized_file"

  /** Reasons that remove the op from the sink-bound flow entirely. */
  val Fatal: Seq[String] = Seq(EmptyId, OversizedId)

  /** The reject column carried through the hot path. */
  val ReasonCol = "reject_reason"

  /** Id-guard reason for one op — null for accepted rows. Drop ops are
    * exempt: they legitimately carry no id (the reference routes them
    * before any id check, monstache.go:3057/3065). The 512-byte cap is
    * BYTES, not characters (Lucene's term limit is on encoded bytes). */
  def idReason(id: Column, operation: Column): Column =
    when(operation.isin("drop_coll", "drop_db"), lit(null).cast("string"))
      .when(id.isNull || length(id) === 0, lit(EmptyId))
      .when(octet_length(id) > 512, lit(OversizedId))

  /** True for rows the sink-bound flow must keep (accepted or advisory). */
  def keep(reason: Column): Column =
    reason.isNull || !reason.isin(Fatal: _*)
}
