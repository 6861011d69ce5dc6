package graft.source.testkit

import graft.source.{ChangeEvent, SourceBatch, SourceTransport}

/** Contract test kit for [[SourceTransport]] implementations — the
  * assertions [[graft.source.TransportSource]] DEPENDS on for
  * correctness, packaged so a real transport author (a MongoDB
  * change-stream client, a Kafka tail, …) does not re-derive them from
  * SourceTransportSpec by hand. The repo's own in-memory mock runs
  * through this kit (SourceTransportSpec "mock passes the TCK"), which
  * is what keeps the kit itself honest.
  *
  * Plain-assertion runner (no test-framework dependency — scalatest is
  * test-scoped here and a deployment may use any framework): each check
  * throws `AssertionError` with a named violation; [[run]] executes all
  * of them. Wrap in one test case:
  * {{{
  *   test("my transport honors the SourceTransport contract") {
  *     new SourceTransportTCK(() => myPreloadedTransport(events)).run()
  *   }
  * }}}
  *
  * `newTransport` must return a FRESH transport over the same retained
  * history each call (≥ [[minEvents]] events available from the
  * beginning of retention), because commit-side checks may advance
  * retention. What the kit verifies, and why the stream needs it:
  *
  *  1. '''Chunked drain totality''' — polling from `None` by `maxDocs`
  *     steps reaches an idle poll and yields each event exactly once,
  *     in a stable order: the offsets the DSv2 source checkpoints are
  *     only meaningful over a deterministic sequence.
  *  2. '''Empty-poll token identity''' — an idle poll returns
  *     `nextToken == polled token`: that identity is how the stream
  *     detects "no new data" and skips the micro-batch; a transport
  *     minting fresh tokens on idle polls would busy-loop the trigger.
  *  3. '''Same-prefix replayability''' — re-polling a retained token
  *     returns the identical event prefix and end token: a restarted
  *     query rebuilds its checkpointed-but-uncommitted batch this way
  *     (T3), and the source VERIFIES the rebuilt end token.
  *  4. '''Resume-after semantics''' — `poll(Some(t), n)` continues
  *     strictly after the events that produced `t`: no overlap, no gap
  *     against the full drain (change streams' `resumeAfter`).
  *  5. '''Commit acceptance + post-commit behavior''' — committing each
  *     end token in order must not throw; after commits, a retained
  *     token must still replay identically, and a token the transport
  *     chose to retire must THROW (loud past-retention), never return
  *     a silently different or empty batch — a silent gap is data loss.
  *
  * Reference behaviors these encode: resume-token persistence and
  * replay (monstache.go `saveTimestamp`/`resumeAll`), the oplog tail's
  * deterministic re-read after restart (pkg/oplog), and the
  * fail-don't-skip stance on lost history. */
final class SourceTransportTCK(newTransport: () => SourceTransport,
                               maxDocs: Int = 7,
                               maxBatches: Int = 100000) {

  /** Drains need at least a few chunks to exercise token hand-off. */
  def minEvents: Int = 2 * maxDocs + 1

  private def fail(check: String, msg: String): Nothing =
    throw new AssertionError(s"SourceTransportTCK [$check]: $msg")

  private def ids(b: SourceBatch): Seq[Long] = b.events.map(_.event_id)

  /** Full drain from the beginning of retention: the (startToken, batch)
    * steps until the idle-poll identity. */
  private def drain(t: SourceTransport)
      : Vector[(Option[String], SourceBatch)] = {
    var tok: Option[String] = None
    val steps = Vector.newBuilder[(Option[String], SourceBatch)]
    var n = 0
    while (n < maxBatches) {
      val b = t.poll(tok, maxDocs)
      if (b.events.isEmpty && tok.contains(b.nextToken)) return steps.result()
      if (b.events.isEmpty && tok.isEmpty && n > 0)
        fail("drain", "empty batch advanced the token mid-drain")
      steps += tok -> b
      tok = Some(b.nextToken)
      n += 1
    }
    fail("drain", s"no idle poll after $maxBatches batches — either the " +
      "transport never reports idle (empty batch with nextToken == " +
      "polled token) or the fixture is endless")
  }

  def checkChunkedDrainTotality(): Unit = {
    val t = newTransport()
    val steps = drain(t)
    val all = steps.flatMap(s => ids(s._2))
    if (all.size < minEvents)
      fail("drain", s"fixture too small: ${all.size} events drained, " +
        s"the kit needs >= $minEvents to exercise chunk hand-off")
    if (all.distinct.size != all.size)
      fail("drain", s"an event id appeared twice across chunks: " +
        all.diff(all.distinct).take(5).mkString(","))
    if (steps.exists(_._2.events.size > maxDocs))
      fail("drain", "a batch exceeded the requested maxDocs")
    val again = drain(newTransport()).flatMap(s => ids(s._2))
    if (again != all)
      fail("drain", "two full drains disagree — the retained history " +
        "must replay in a stable order")
  }

  def checkEmptyPollTokenIdentity(): Unit = {
    val t = newTransport()
    val steps = drain(t)
    if (steps.isEmpty) fail("idle", "fixture has no events")
    val tail = steps.last._2.nextToken
    val idle = t.poll(Some(tail), maxDocs)
    if (idle.events.nonEmpty)
      fail("idle", "a poll at the tail returned events not in the drain")
    if (idle.nextToken != tail)
      fail("idle", s"idle poll minted a fresh token ($tail -> " +
        s"${idle.nextToken}) — the stream would busy-loop on phantom " +
        "micro-batches")
  }

  def checkSamePrefixReplay(): Unit = {
    val t = newTransport()
    val first = t.poll(None, maxDocs)
    val replay = t.poll(None, maxDocs)
    if (ids(first) != ids(replay) || first.nextToken != replay.nextToken)
      fail("replay", "re-polling the same token returned a different " +
        "batch — a restarted query could not rebuild its checkpointed " +
        "micro-batch (T3)")
    // a shorter re-poll must return the PREFIX, not arbitrary rows —
    // the restart path re-polls with the offset's recorded row count
    if (maxDocs > 1) {
      val prefix = t.poll(None, maxDocs - 1)
      if (ids(prefix) != ids(first).take(maxDocs - 1))
        fail("replay", "poll(token, n-1) is not a prefix of poll(token, n)")
    }
  }

  def checkResumeAfter(): Unit = {
    val t = newTransport()
    val full = drain(newTransport()).flatMap(s => ids(s._2))
    val first = t.poll(None, maxDocs)
    val rest = t.poll(Some(first.nextToken), maxDocs * maxBatches)
    val got = ids(first) ++ ids(rest)
    if (got != full.take(got.size))
      fail("resume", "poll(Some(t)) did not continue strictly after the " +
        s"events that produced t: expected ${full.take(got.size).take(8)}" +
        s"..., got ${got.take(8)}...")
    if (ids(rest).exists(ids(first).toSet))
      fail("resume", "resumed batch overlaps the batch that produced " +
        "the token — duplicate delivery")
  }

  def checkCommitAndRetention(): Unit = {
    val t = newTransport()
    val steps = drain(t)
    if (steps.size < 2) fail("commit", "fixture too small for commits")
    // commits in batch order must be accepted (the stream acks every
    // committed micro-batch's end token)
    steps.foreach(s => t.commit(s._2.nextToken))
    // post-commit, each historical token either still replays its exact
    // suffix (retained) or throws (retired) — silence is the violation
    steps.zipWithIndex.foreach { case ((startTok, orig), i) =>
      val replayed =
        try Some(t.poll(startTok, maxDocs))
        catch { case _: Exception => None } // loud past-retention: fine
      replayed.foreach { b =>
        if (ids(b) != ids(orig) || b.nextToken != orig.nextToken)
          fail("commit", s"after commits, step $i replayed differently " +
            "— a transport must either retain (same prefix) or throw, " +
            "never silently alter history")
      }
    }
  }

  /** All contract checks, fail-fast in dependency order. */
  def run(): Unit = {
    checkChunkedDrainTotality()
    checkEmptyPollTokenIdentity()
    checkSamePrefixReplay()
    checkResumeAfter()
    checkCommitAndRetention()
  }
}
