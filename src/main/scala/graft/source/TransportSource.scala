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
  * pre-history start ("poll from the beginning of retention"). */
private[source] final case class TokenOffset(token: Option[String])
    extends Offset {
  override def json(): String = token match {
    case Some(t) => s"""{"token":"${Base64.getEncoder
      .encodeToString(t.getBytes("UTF-8"))}"}"""
    case None => """{"token":null}"""
  }
}

private[source] object TokenOffset {
  private val Re = """\{"token":"([A-Za-z0-9+/=]*)"\}""".r

  def parse(json: String): TokenOffset = json.trim match {
    case """{"token":null}""" => TokenOffset(None)
    case Re(b64) => TokenOffset(Some(
      new String(Base64.getDecoder.decode(b64), "UTF-8")))
    case other =>
      throw new IllegalArgumentException(s"bad transport offset: $other")
  }
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
          new TransportMicroBatch(transport, maxDocs)
        }
      }
    }
}

private[source] class TransportMicroBatch(transport: SourceTransport,
                                          maxDocs: Int)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  /** Trigger.AvailableNow (the daemon's --once drain): nothing to
    * capture — `latestOffset` already returns its start offset the
    * moment a poll comes back empty on the same token, which ends the
    * run. A token space is opaque (no order), so "all available" IS
    * "drain until the transport reports idle" — the reference's
    * exit-after mode drains its direct reads the same way. */
  override def prepareForTriggerAvailableNow(): Unit = ()

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
    val batch = transport.poll(s.token, maxDocs)
    val end = TokenOffset(Some(batch.nextToken))
    if (batch.events.isEmpty && s.token.contains(batch.nextToken)) start
    else { cached = Some((s, end, batch.events)); end }
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
        // restart path: rebuild the checkpointed-but-uncommitted batch
        val batch = transport.poll(s.token, maxDocs)
        require(e.token.contains(batch.nextToken),
          s"transport replay from ${s.token} landed on token " +
            s"${batch.nextToken}, but the checkpoint recorded ${e.token}" +
            " — the source lost retained history; refusing to narrow " +
            "the batch")
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
    end.asInstanceOf[TokenOffset].token.foreach(transport.commit)
    cached = cached.filter { case (_, ce, _) => ce != end }
  }

  override def stop(): Unit = ()
}

/** One micro-batch's rows, shipped whole to a single reader task (the
  * serial-cursor shape — see [[TransportSource]] scale note). */
private[source] final case class TransportPartition(events: Seq[ChangeEvent])
    extends InputPartition
