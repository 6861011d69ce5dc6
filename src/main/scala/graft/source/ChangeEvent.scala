package graft.source

/** Typed change-event envelope (SURVEY §1.3) — the case-class twin of
  * [[EventLog.envelope]]'s columns, for Dataset[ChangeEvent] APIs
  * (streaming sources, keyed state) where compile-time row shape helps.
  * Field order/names match the envelope DataFrame exactly.
  *
  * `value` is a primitive (non-nullable) Double: DATA ops always carry
  * one. Drop ops ([[EventLog.envelopeWithDrops]]) carry a null value —
  * converting a drops-carrying frame with `.as[ChangeEvent]` needs a
  * `coalesce(value, 0.0)` first, or the deserializer throws on the
  * first drop row. */
case class ChangeEvent(
    event_id: Long,
    id: String,
    db: String,
    coll: String,
    namespace: String,
    operation: String,
    ts_us: Long,
    version: Long,
    document: String,
    value: Double,
    source: String)
