package graft.source

import java.util.Base64

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Structured Streaming source over a [[SourceTransport]] — the
  * change-stream deployment path (S1/S2/S8). A DSv2 micro-batch source
  * whose OFFSET IS THE RESUME TOKEN: Spark's offset log checkpoints the
  * token per batch, so kill + restart resumes from exactly the token the
  * last committed batch ended at (the reference persists its resume
  * token for the same purpose, monstache.go `saveTimestamp`/`resumeAll`).
  *
  * Admission control (`latestOffset(start, limit)`) hands the stream its
  * confirmed position every trigger, so a restarted query needs no
  * cursor reconstruction: the first trigger after restart polls from the
  * checkpointed token. An uncommitted trailing batch is rebuilt by
  * `planInputPartitions(start, end)` re-polling `start` — the transport's
  * replayability contract — and the rebuild is VERIFIED to land on the
  * same end token (a mismatch means the source lost history: fail loudly,
  * never silently narrow a batch).
  *
  * Rows surface in [[TransportSource.Schema]], exactly
  * [[EventLog.envelopeFrom]]'s envelope (spec-pinned), so everything
  * downstream — mappers, relate, routing, the sink writer — is identical
  * whether events arrive from the parquet stand-in or a live transport.
  *
  * Scale shape: the poll runs on the driver (a change-stream cursor is
  * serial by nature — the reference's gtm cursor is too) and each
  * micro-batch ships at most `maxDocs` envelope rows to the cluster as
  * ONE input partition; parallelism begins at the first downstream
  * shuffle (the upsert's id-hash), which is where it begins for the
  * reference's worker pool as well. `maxDocs` bounds the driver
  * footprint by contract — the EsTransport.scanState discipline.
  *
  * Usage:
  * {{{
  *   SourceTransports.register("prod", myTransport)
  *   spark.readStream.format(TransportSource.Format)
  *     .option("transport", "prod").option("maxDocs", "50000").load()
  * }}}
  */
object TransportSource {

  /** `readStream.format(...)` name — the provider class itself. */
  val Format: String = classOf[TransportSourceProvider].getName

  /** The §1.3 envelope, derived from [[ChangeEvent]]'s encoder so the
    * source schema and the case class can never drift. */
  val Schema: StructType =
    org.apache.spark.sql.Encoders.product[ChangeEvent].schema

  private[source] def toRow(e: ChangeEvent): InternalRow =
    new GenericInternalRow(Array[Any](
      e.event_id,
      UTF8String.fromString(e.id),
      UTF8String.fromString(e.db),
      UTF8String.fromString(e.coll),
      UTF8String.fromString(e.namespace),
      UTF8String.fromString(e.operation),
      e.ts_us,
      e.version,
      if (e.document == null) null else UTF8String.fromString(e.document),
      e.value,
      UTF8String.fromString(e.source)))
}

/** Resume-token offset. The token rides base64 so the offset JSON never
  * depends on what bytes a deployment's tokens contain; `None` is the
  * pre-history start ("poll from the beginning of retention"). `rows`
  * is the size of the batch that ENDED at this token: a restart rebuild
  * re-polls with that exact size, so the rebuild stays correct even if
  * `--maxDocs` changed across the restart (tokens are opaque — only the
  * original row count reproduces the original batch boundary). Absent
  * on pre-rows checkpoints and on the initial offset. */
private[source] final case class TokenOffset(token: Option[String],
                                             rows: Option[Int] = None)
    extends Offset {
  override def json(): String = token match {
    case Some(t) => s"""{"token":"${Base64.getEncoder
      .encodeToString(t.getBytes("UTF-8"))}"""" +
      rows.map(r => s""","rows":$r""").getOrElse("") + "}"
    case None => """{"token":null}"""
  }
}

private[source] object TokenOffset {
  private val Re = """\{"token":"([A-Za-z0-9+/=]*)"\}""".r
  private val ReRows = """\{"token":"([A-Za-z0-9+/=]*)","rows":(\d+)\}""".r

  def parse(json: String): TokenOffset = json.trim match {
    case """{"token":null}""" => TokenOffset(None)
    case ReRows(b64, n) => TokenOffset(Some(
      new String(Base64.getDecoder.decode(b64), "UTF-8")), Some(n.toInt))
    case Re(b64) => TokenOffset(Some(
      new String(Base64.getDecoder.decode(b64), "UTF-8")))
    case other =>
      throw new IllegalArgumentException(s"bad transport offset: $other")
  }
}

/** Driver-side lag gauges for running transport sources — the analog of
  * the reference's intake-position line in its stats loop
  * (monstache.go:4959-4972): without it, a wedged transport (or a sink
  * so slow commits stop landing) is invisible until the watchdog fires.
  * [[TransportMicroBatch]] updates its gauge on every poll/commit;
  * [[graft.streaming.HealthServer]] serves the snapshot at `/sources`.
  * Keyed by the stream's transport name — control-plane-sized,
  * driver-local, best-effort (a restart's replayed batch is counted by
  * its commit only, so `docsPending` may transiently undercount). */
object TransportLag {
  final case class Gauge(
      transport: String,
      lastPollAtMs: Long,
      lastDataAtMs: Long,
      lastCommitAtMs: Long,
      docsPolled: Long,
      docsCommitted: Long,
      lastToken: Option[String]) {
    /** Polled-but-uncommitted rows — rises while a micro-batch is being
      * processed, falls back on commit; monotone growth = wedged sink. */
    def docsPending: Long = math.max(docsPolled - docsCommitted, 0L)
  }

  private val reg =
    new java.util.concurrent.ConcurrentHashMap[String, Gauge]()

  private def now(): Long = System.currentTimeMillis()

  private[source] def onPoll(key: String, docs: Int,
                             token: Option[String]): Unit =
    reg.compute(key, (_, g0) => {
      val g = Option(g0).getOrElse(Gauge(key, 0L, 0L, 0L, 0L, 0L, None))
      g.copy(lastPollAtMs = now(),
        lastDataAtMs = if (docs > 0) now() else g.lastDataAtMs,
        docsPolled = g.docsPolled + docs,
        lastToken = token.orElse(g.lastToken))
    })

  private[source] def onCommit(key: String, docs: Long,
                               token: String): Unit =
    reg.compute(key, (_, g0) => {
      val g = Option(g0).getOrElse(Gauge(key, 0L, 0L, 0L, 0L, 0L, None))
      g.copy(lastCommitAtMs = now(),
        docsCommitted = g.docsCommitted + docs,
        lastToken = Some(token))
    })

  def snapshot: Map[String, Gauge] = {
    val b = Map.newBuilder[String, Gauge]
    reg.forEach((k, v) => b += k -> v)
    b.result()
  }

  /** Specs and daemon restarts start from a clean slate. */
  def reset(): Unit = reg.clear()
}

/** Zero-arg provider instantiated by Spark from the format string. */
class TransportSourceProvider extends TableProvider {
  override def inferSchema(opts: CaseInsensitiveStringMap): StructType =
    TransportSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        props: java.util.Map[String, String]): Table =
    new TransportTable(new CaseInsensitiveStringMap(props))
}

private[source] class TransportTable(opts: CaseInsensitiveStringMap)
    extends Table with SupportsRead {

  override def name(): String = "graft-transport"
  override def schema(): StructType = TransportSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava

  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = TransportSource.Schema
        override def toMicroBatchStream(chk: String): MicroBatchStream = {
          val transport =
            Option(opts.get("transport")).map(SourceTransports.lookup)
              .orElse(Option(opts.get("transportclass")).map { fqcn =>
                Class.forName(fqcn).getDeclaredConstructor()
                  .newInstance().asInstanceOf[SourceTransport]
              })
              .getOrElse(throw new IllegalArgumentException(
                "graft-transport needs option transport=<registry key> " +
                  "or transportClass=<fqcn>"))
          val maxDocs = Option(opts.get("maxdocs")).map(_.toInt)
            .getOrElse(10000)
          require(maxDocs > 0, s"maxDocs must be positive, got $maxDocs")
          val lagKey = Option(opts.get("transport"))
            .orElse(Option(opts.get("transportclass")))
            .getOrElse(transport.getClass.getName)
          new TransportMicroBatch(transport, maxDocs, lagKey)
        }
      }
    }
}

private[source] class TransportMicroBatch(transport: SourceTransport,
                                          maxDocs: Int,
                                          lagKey: String = "transport",
                                          drainWalkSteps: Int = 10000)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  /** Trigger.AvailableNow (the daemon's --once drain): the
    * SupportsTriggerAvailableNow contract caps the run at the data
    * available when the trigger fires — against a transport that keeps
    * producing, "drain until an idle poll" never terminates. Tokens are
    * opaque (no order), so the cap is captured as a WALK: at the first
    * trigger after prepare, poll driver-side from the restart offset to
    * the current tail once, recording each step's (start token → row
    * count, end token); the drain then replays exactly those steps
    * (replayable-while-retained + append-only ⇒ same rows) and stops at
    * the captured tail, ignoring anything that arrived later. The walk
    * discards event payloads (O(#steps) memory) — the drain re-polls
    * each batch, so a capped run reads the backlog twice; the daemon's
    * --once mode is the bounded-backlog path where that is cheap.
    * `drainWalkSteps` backstops a true firehose: the cap cuts the
    * drain at a consistent token and the next --once run continues. */
  override def prepareForTriggerAvailableNow(): Unit = { prepared = true }

  @volatile private var prepared = false
  @volatile private var drainPlan: Option[DrainPlan] = None

  private def walk(from: Option[String]): DrainPlan = {
    val steps = Map.newBuilder[Option[String], (Int, String)]
    var tok = from
    var n = 0
    var done = false
    while (!done && n < drainWalkSteps) {
      val b = transport.poll(tok, maxDocs)
      if (b.events.isEmpty && tok.contains(b.nextToken)) done = true
      else {
        steps += tok -> ((b.events.size, b.nextToken))
        tok = Some(b.nextToken)
        n += 1
      }
    }
    DrainPlan(steps.result(), tok)
  }

  // the last poll, keyed by (start, end) offsets — latestOffset already
  // read the batch's events, so the common path's planInputPartitions
  // reuses them instead of polling twice; a restart misses the cache and
  // re-polls (the transport's replayability contract)
  @volatile private var cached
      : Option[(TokenOffset, TokenOffset, Seq[ChangeEvent])] = None

  override def initialOffset(): Offset = TokenOffset(None)

  override def deserializeOffset(json: String): Offset =
    TokenOffset.parse(json)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(maxDocs)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[TokenOffset]
    if (prepared && drainPlan.isEmpty) drainPlan = Some(walk(s.token))
    drainPlan match {
      case Some(p) if s.token != p.tail =>
        p.steps.get(s.token) match {
          case Some((n, endTok)) =>
            val batch =
              if (n == 0) SourceBatch(Nil, endTok)
              else transport.poll(s.token, n)
            require(batch.nextToken == endTok,
              s"drain replay from ${s.token} landed on token " +
                s"${batch.nextToken}, but the prepare-time walk recorded " +
                s"$endTok — the source lost retained history")
            val end = TokenOffset(Some(endTok), Some(n))
            TransportLag.onPoll(lagKey, batch.events.size, end.token)
            cached = Some((s, end, batch.events)); end
          case None =>
            // off the captured walk (an offset from before prepare, or a
            // re-prepared restart): re-anchor the walk here — it keys its
            // first step at s.token or tails out immediately
            drainPlan = Some(walk(s.token))
            latestOffset(start, limit)
        }
      case Some(_) => start // captured tail reached: the drain is done
      case None =>
        val batch = transport.poll(s.token, maxDocs)
        val end = TokenOffset(Some(batch.nextToken),
          Some(batch.events.size))
        if (batch.events.isEmpty && s.token.contains(batch.nextToken)) {
          TransportLag.onPoll(lagKey, 0, s.token)
          start
        } else {
          TransportLag.onPoll(lagKey, batch.events.size, end.token)
          cached = Some((s, end, batch.events)); end
        }
    }
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) drives this stream")

  override def planInputPartitions(start: Offset,
                                   end: Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[TokenOffset],
      end.asInstanceOf[TokenOffset])
    val events = cached match {
      case Some((cs, ce, evs)) if cs == s && ce == e => evs
      case _ =>
        // restart path: rebuild the checkpointed-but-uncommitted batch by
        // re-polling with the batch's RECORDED row count (the offset
        // carries it), so the rebuild reproduces the original boundary
        // even if --maxDocs changed across the restart; a pre-rows
        // checkpoint falls back to the current maxDocs
        val n = e.rows.getOrElse(maxDocs)
        val batch =
          if (n == 0) SourceBatch(Nil, e.token.getOrElse(""))
          else transport.poll(s.token, n)
        require(e.token.contains(batch.nextToken),
          s"transport replay of $n rows from ${s.token} landed on token " +
            s"${batch.nextToken}, but the checkpoint recorded ${e.token}" +
            " — the source lost retained history (or, if this checkpoint" +
            " predates per-batch row counts in offsets, --maxDocs" +
            " changed across the restart); refusing to narrow the batch")
        batch.events
    }
    Array(TransportPartition(events))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
        val events = p.asInstanceOf[TransportPartition].events
        new PartitionReader[InternalRow] {
          private val it = events.iterator
          private var cur: InternalRow = _
          override def next(): Boolean =
            if (it.hasNext) { cur = TransportSource.toRow(it.next()); true }
            else false
          override def get(): InternalRow = cur
          override def close(): Unit = ()
        }
      }
    }

  override def commit(end: Offset): Unit = {
    val e = end.asInstanceOf[TokenOffset]
    e.token.foreach { t =>
      transport.commit(t)
      // the offset carries its batch's row count, so the lag gauge's
      // docsCommitted needs no side table
      TransportLag.onCommit(lagKey, e.rows.getOrElse(0).toLong, t)
    }
    cached = cached.filter { case (_, ce, _) => ce != end }
  }

  override def stop(): Unit = ()
}

/** One micro-batch's rows, shipped whole to a single reader task (the
  * serial-cursor shape — see [[TransportSource]] scale note). */
private[source] final case class TransportPartition(events: Seq[ChangeEvent])
    extends InputPartition

/** A prepare-time drain capture: each step maps a start token to its
  * (row count, end token); `tail` is where the drain stops. */
private[source] final case class DrainPlan(
    steps: Map[Option[String], (Int, String)], tail: Option[String])
