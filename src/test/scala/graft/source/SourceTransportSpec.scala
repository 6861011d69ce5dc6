package graft.source

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.connector.read.streaming.ReadLimit
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The source-side deployment seam (S1/S2/S8): [[SourceTransport]] +
  * [[TransportSource]] — the mirror of EsSinkBackendSpec. An in-memory
  * mock transport stands in for the change-stream client (the repo is
  * network-free); the spec pins the resume-token round-trip through
  * Spark's offset checkpoint, the replay-verification raise, the
  * chunking, the commit ack, and envelope-schema parity with
  * [[EventLog.envelopeFrom]]. */
class SourceTransportSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def mkEvent(i: Int): ChangeEvent = {
    val op = if (i % 11 == 0) "d" else if (i % 3 == 0) "i" else "u"
    ChangeEvent(i.toLong, (i % 17).toString, "app", s"t${i % 4}",
      s"app.t${i % 4}", op, 1000000L + i, (1000000L + i) * 4,
      if (op == "d") null else s"""{"k":$i}""", i.toDouble, "oplog")
  }

  /** Index-token mock: token = count of events consumed so far. */
  private class MockTransport(initial: Seq[ChangeEvent])
      extends SourceTransport {
    private val log =
      scala.collection.mutable.ArrayBuffer[ChangeEvent](initial: _*)
    val polls = scala.collection.mutable.ArrayBuffer[Option[String]]()
    val committed = scala.collection.mutable.ArrayBuffer[String]()
    def append(evs: Seq[ChangeEvent]): Unit = synchronized { log ++= evs }
    override def poll(tok: Option[String], maxDocs: Int): SourceBatch =
      synchronized {
        polls += tok
        val from = tok.map(_.toInt).getOrElse(0)
        val evs = log.slice(from, from + maxDocs).toVector
        SourceBatch(evs, (from + evs.length).toString)
      }
    override def commit(token: String): Unit =
      synchronized { committed += token }
  }

  private def startCollect(key: String, ckpt: String, maxDocs: Int,
                           into: scala.collection.mutable.ArrayBuffer[Row],
                           batches: scala.collection.mutable.ArrayBuffer[Long]) =
    spark.readStream.format(TransportSource.Format)
      .option("transport", key).option("maxDocs", maxDocs.toString).load()
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        val rows = df.collect()
        into.synchronized { into ++= rows; batches += id }
        ()
      }
      .option("checkpointLocation", ckpt)
      .start()

  test("transport schema IS the envelope schema (name+type parity)") {
    val env = EventLog.envelope(spark, "/root/testdata/sf0.001")
    val got = TransportSource.Schema.fields.map(f => (f.name, f.dataType))
    val want = env.schema.fields.map(f => (f.name, f.dataType))
    assert(got.toSeq == want.toSeq,
      s"transport rows must match EventLog.envelopeFrom exactly:\n" +
        s"transport ${got.mkString(",")}\nenvelope  ${want.mkString(",")}")
  }

  test("streams all events in order, chunked to maxDocs micro-batches") {
    val t = new MockTransport((0 until 120).map(mkEvent))
    SourceTransports.register("spec-chunks", t)
    try {
      val ckpt = Files.createTempDirectory("graft-transport-ck1").toString
      val rows = scala.collection.mutable.ArrayBuffer[Row]()
      val batches = scala.collection.mutable.ArrayBuffer[Long]()
      val q = startCollect("spec-chunks", ckpt, 50, rows, batches)
      q.processAllAvailable(); q.stop()
      assert(rows.map(_.getLong(0)).sorted == (0L until 120L),
        "every event exactly once")
      val nonEmpty = rows.size
      assert(nonEmpty == 120)
      // 120 events at maxDocs=50 → at least 3 data-carrying polls
      assert(t.polls.count(_.isDefined) + t.polls.count(_.isEmpty) >= 3)
      val r0 = rows.minBy(_.getLong(0))
      assert(r0.getString(4) == "app.t0" && r0.getString(10) == "oplog",
        "namespace/source columns ride through the envelope")
    } finally SourceTransports.unregister("spec-chunks")
  }

  test("kill + restart resumes from the checkpointed resume token") {
    val t = new MockTransport((0 until 80).map(mkEvent))
    SourceTransports.register("spec-resume", t)
    try {
      val ckpt = Files.createTempDirectory("graft-transport-ck2").toString
      val rows1 = scala.collection.mutable.ArrayBuffer[Row]()
      val b1 = scala.collection.mutable.ArrayBuffer[Long]()
      val q1 = startCollect("spec-resume", ckpt, 30, rows1, b1)
      q1.processAllAvailable(); q1.stop()
      assert(rows1.map(_.getLong(0)).sorted == (0L until 80L))

      // the "crash window": 40 more events land while nothing runs
      t.append((80 until 120).map(mkEvent))
      t.polls.clear()
      val rows2 = scala.collection.mutable.ArrayBuffer[Row]()
      val b2 = scala.collection.mutable.ArrayBuffer[Long]()
      val q2 = startCollect("spec-resume", ckpt, 30, rows2, b2)
      q2.processAllAvailable(); q2.stop()
      assert(rows2.map(_.getLong(0)).sorted == (80L until 120L),
        s"restart must deliver exactly the new events, got " +
          s"${rows2.map(_.getLong(0)).sorted}")
      assert(t.polls.forall(p => p.exists(_.toInt >= 80)),
        s"the restarted query must poll from the committed token, " +
          s"polled: ${t.polls}")
      // commit() acks lag one trigger by design (Spark commits batch N
      // while constructing N+1) — the CHECKPOINT is the durability
      // mechanism, the ack is the reference's periodic server-side
      // token save. Pin that acks arrive and only move forward.
      val acked = t.committed.map(_.toInt)
      assert(acked.nonEmpty && acked == acked.sorted,
        s"monotone commit acks, got: ${t.committed}")
      assert(acked.max >= 110,
        s"acks must reach the stream's tail, acked: ${t.committed}")
    } finally SourceTransports.unregister("spec-resume")
  }

  test("replay rebuild verifies the end token and raises on lost history") {
    val t = new MockTransport((0 until 40).map(mkEvent))
    val s1 = new TransportMicroBatch(t, 25)
    val start = s1.initialOffset()
    val end = s1.latestOffset(start, ReadLimit.maxRows(25))
    assert(end.asInstanceOf[TokenOffset].token.contains("25"))

    // a FRESH stream instance (the restart) rebuilds the batch by
    // re-polling — cache cold, same data → same end token, succeeds
    val s2 = new TransportMicroBatch(t, 25)
    val parts = s2.planInputPartitions(
      s2.deserializeOffset(start.json()), s2.deserializeOffset(end.json()))
    assert(parts.length == 1 &&
      parts(0).asInstanceOf[TransportPartition].events.size == 25)

    // a transport that lost history (shorter log) must raise, not
    // silently narrow the batch
    val lossy = new MockTransport((0 until 10).map(mkEvent))
    val s3 = new TransportMicroBatch(lossy, 25)
    val e = intercept[IllegalArgumentException](
      s3.planInputPartitions(
        s3.deserializeOffset(start.json()), s3.deserializeOffset(end.json())))
    assert(e.getMessage.contains("lost retained history"))
  }

  test("Trigger.AvailableNow caps the drain at prepare-time availability") {
    // the SupportsTriggerAvailableNow contract: events arriving AFTER
    // the prepare-time walk must not extend the drain — against a
    // transport that keeps producing, an uncapped idle-poll drain never
    // terminates (the daemon --once hang class)
    val t = new MockTransport((0 until 50).map(mkEvent))
    val s = new TransportMicroBatch(t, 20)
    s.prepareForTriggerAvailableNow()
    var off = s.initialOffset()
    var drained = 0
    var batches = 0
    var done = false
    while (!done && batches < 10) {
      val nxt = s.latestOffset(off, ReadLimit.maxRows(20))
      if (nxt == off) done = true
      else {
        if (batches == 0) t.append((50 until 70).map(mkEvent))
        drained += s.planInputPartitions(off, nxt)(0)
          .asInstanceOf[TransportPartition].events.size
        s.commit(nxt); off = nxt; batches += 1
      }
    }
    assert(done, "the drain must terminate at the prepare-time tail")
    assert(drained == 50,
      s"only prepare-time rows belong to the drain, got $drained")
    // the next run (a fresh prepare) picks up the late arrivals
    val s2 = new TransportMicroBatch(t, 20)
    s2.prepareForTriggerAvailableNow()
    val nxt2 = s2.latestOffset(off, ReadLimit.maxRows(20))
    assert(s2.planInputPartitions(off, nxt2)(0)
      .asInstanceOf[TransportPartition].events.size == 20)
  }

  test("the drain walk is bounded against a firehose transport") {
    // a transport with an endless backlog: the walk cap cuts the drain
    // at a consistent token instead of polling forever at prepare time
    val t = new MockTransport((0 until 1000).map(mkEvent))
    val s = new TransportMicroBatch(t, 5, drainWalkSteps = 3)
    s.prepareForTriggerAvailableNow()
    var off = s.initialOffset()
    var drained = 0
    var done = false
    while (!done && drained <= 1000) {
      val nxt = s.latestOffset(off, ReadLimit.maxRows(5))
      if (nxt == off) done = true
      else {
        drained += s.planInputPartitions(off, nxt)(0)
          .asInstanceOf[TransportPartition].events.size
        s.commit(nxt); off = nxt
      }
    }
    assert(done && drained == 15,
      s"3 walk steps x 5 docs = 15 rows per --once run, got $drained")
  }

  test("restart rebuild re-polls with the RECORDED batch size, not maxDocs") {
    val t = new MockTransport((0 until 40).map(mkEvent))
    val s1 = new TransportMicroBatch(t, 25)
    val start = s1.initialOffset()
    val end = s1.latestOffset(start, ReadLimit.maxRows(25))
    // the offset of record carries the batch's row count
    assert(end.asInstanceOf[TokenOffset].rows.contains(25))

    // restart with a CHANGED --maxDocs: the rebuild must reproduce the
    // original 25-row boundary from the offset's recorded size
    val s2 = new TransportMicroBatch(t, 10)
    val parts = s2.planInputPartitions(
      s2.deserializeOffset(start.json()), s2.deserializeOffset(end.json()))
    assert(parts(0).asInstanceOf[TransportPartition].events.size == 25)

    // a pre-rows checkpoint (legacy offset JSON, no recorded size) with
    // a changed maxDocs cannot reproduce the boundary — the raise must
    // name the maxDocs change as a possible cause, not just "lost
    // history" (round-13 advice)
    val legacyEnd = s2.deserializeOffset(
      s"""{"token":"${java.util.Base64.getEncoder
        .encodeToString("25".getBytes("UTF-8"))}"}""")
    val e = intercept[IllegalArgumentException](s2.planInputPartitions(
      s2.deserializeOffset(start.json()), legacyEnd))
    assert(e.getMessage.contains("maxDocs"))
  }

  test("an idle poll (token identity) yields no new micro-batch") {
    val t = new MockTransport((0 until 5).map(mkEvent))
    val s = new TransportMicroBatch(t, 10)
    val o1 = s.latestOffset(s.initialOffset(), ReadLimit.maxRows(10))
    assert(o1.asInstanceOf[TokenOffset].token.contains("5"))
    val o2 = s.latestOffset(o1, ReadLimit.maxRows(10))
    assert(o2 eq o1, "no data + same token must return the start offset")
  }

  test("the in-memory mock passes the SourceTransport TCK") {
    // the reusable contract kit a real transport author runs
    // (graft.source.testkit) — the mock going through it is what keeps
    // the kit itself honest
    new graft.source.testkit.SourceTransportTCK(
      () => new MockTransport((0 until 40).map(mkEvent))).run()
  }

  test("the TCK catches a transport that silently retires history") {
    // commits advance retention, and polls of retired tokens return a
    // SILENT empty batch instead of replaying or throwing — the
    // data-loss violation the kit exists to reject
    class Lossy extends SourceTransport {
      private val log = (0 until 40).map(mkEvent)
      @volatile private var committedUpTo = -1
      override def poll(tok: Option[String], maxDocs: Int): SourceBatch =
        if (tok.exists(_.toInt < committedUpTo))
          SourceBatch(Nil, tok.get) // silent gap, the contract violation
        else {
          val from = tok.map(_.toInt).getOrElse(0)
          val evs = log.slice(from, from + maxDocs)
          SourceBatch(evs, (from + evs.length).toString)
        }
      override def commit(token: String): Unit = { committedUpTo = token.toInt }
    }
    val e = intercept[AssertionError](
      new graft.source.testkit.SourceTransportTCK(() => new Lossy).run())
    assert(e.getMessage.contains("silently alter history"),
      s"wrong violation surfaced: ${e.getMessage}")
  }

  test("token offsets round-trip arbitrary token bytes through JSON") {
    for (tok <- Seq("""{"_data":"8263A5..."}""", "plain", "", "a\"b\\c\nd",
        "日本語", "0")) {
      val o = TokenOffset(Some(tok))
      assert(TokenOffset.parse(o.json()) == o, s"round-trip of '$tok'")
    }
    assert(TokenOffset.parse(TokenOffset(None).json()) == TokenOffset(None))
  }
}
