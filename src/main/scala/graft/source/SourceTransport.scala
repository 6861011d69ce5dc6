package graft.source

/** One transport pull: [[ChangeEvent]] envelope rows (normalized by the
  * transport — a real one maps its change-stream documents onto §1.3
  * exactly as [[EventLog.envelopeFrom]] maps the test events table) plus
  * the resume token that continues AFTER them. `nextToken` must equal
  * the polled token when no events were available (that identity is how
  * the stream detects "no new data" and skips the micro-batch). */
final case class SourceBatch(events: Seq[ChangeEvent], nextToken: String)
    extends Serializable

/** The source-side deployment seam — the mirror of [[graft.sink.EsTransport]]:
  * the ONLY piece a real deployment implements (over a MongoDB change
  * stream / oplog cursor; the reference's `gtm.StartMulti` wiring,
  * monstache.go:4899-4916, options 4852-4897). This repo is network-free
  * by design, so no client ships here; [[TransportSource]] turns any
  * implementation into a Structured Streaming source whose OFFSETS ARE
  * THE RESUME TOKENS, and the unit spec drives the same surface with an
  * in-memory mock exactly like EsSinkBackendSpec does for the sink.
  *
  * Contract:
  *   - `poll(None, n)` starts from the beginning of the retained
  *     history (the reference's `replay` mode); `poll(Some(t), n)`
  *     resumes strictly AFTER the event that produced `t` (change
  *     streams' `resumeAfter`).
  *   - REPLAYABLE while retained: polling the same token again returns
  *     the same event prefix — that is what lets a restarted query
  *     rebuild its last uncommitted micro-batch from the checkpointed
  *     offset (T3). A token past retention should throw, not return an
  *     empty batch (a silent gap would be data loss).
  *   - Driver-side only, NEVER shipped to executors: a change-stream
  *     cursor is inherently serial (the reference tails one gtm cursor
  *     per shard too), so the stream polls on the driver and ships the
  *     resulting rows — each batch's driver footprint is bounded by the
  *     source's `maxDocs` option (the loud-contract class shared with
  *     `EsTransport.scanState`). A firehose-scale source belongs behind
  *     a partitioned connector instead; this seam is the tail path.
  */
trait SourceTransport {

  /** Pull up to `maxDocs` events after `resumeToken`. */
  def poll(resumeToken: Option[String], maxDocs: Int): SourceBatch

  /** Ack that everything at-or-before `token` is durably processed —
    * the reference periodically saves its resume token server-side
    * (monstache.go `saveTimestamp`); the Spark checkpoint already makes
    * restarts correct, so this is an optional server-side hook. */
  def commit(token: String): Unit = ()
}

/** In-process registry wiring [[SourceTransport]] instances to the DSv2
  * source by name: DataSource options are string-only, so a constructed
  * transport (a mock in specs, a client built from app config in a
  * deployment `main`) registers here and the stream selects it with
  * `.option("transport", key)`. Deployments that prefer construction
  * from options can pass `.option("transportClass", fqcn)` (zero-arg
  * constructor) instead and skip the registry. */
object SourceTransports {
  private val reg =
    new java.util.concurrent.ConcurrentHashMap[String, SourceTransport]()

  def register(key: String, t: SourceTransport): Unit = reg.put(key, t)

  def unregister(key: String): Unit = reg.remove(key)

  private[source] def lookup(key: String): SourceTransport = {
    val t = reg.get(key)
    require(t != null,
      s"SourceTransports: no transport registered under '$key' — call " +
        "SourceTransports.register(key, transport) before starting the " +
        "stream, or pass transportClass=<fqcn> instead")
    t
  }
}
