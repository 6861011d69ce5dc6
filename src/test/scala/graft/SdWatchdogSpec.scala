package graft

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.SdWatchdog

/** sd_notify protocol pinned against a recording sender (JEP 380 left
  * UNIX *datagram* channels out of the JDK, so a real SOCK_DGRAM bind is
  * impossible in-process — the transport is injected exactly like the
  * ES sink's mock transport): READY before any ping, WATCHDOG pings at
  * the half-interval, pings withheld while the liveness predicate is
  * down, stop() ends the stream, fromEnv degrades silently outside
  * systemd, and the real `notify` never throws at a dead path. */
class SdWatchdogSpec extends AnyFunSuite {

  private final class Recorder {
    val sent = new ConcurrentLinkedQueue[String]()
    def send(path: String, state: String): Boolean = { sent.add(s"$path|$state"); true }
    def states: Seq[String] = sent.asScala.toSeq.map(_.split('|').last)
  }

  private def awaitUntil(cond: () => Boolean, deadlineMs: Long = 5000): Unit = {
    val end = System.currentTimeMillis() + deadlineMs
    while (System.currentTimeMillis() < end && !cond()) Thread.sleep(10)
  }

  test("READY on start, then WATCHDOG pings at the half-interval") {
    val rec = new Recorder
    val h = SdWatchdog.start("/run/notify", watchdogUsec = 40000L, () => true, rec.send)
    try {
      awaitUntil(() => rec.states.contains("WATCHDOG=1"))
      val states = rec.states
      assert(states.headOption.contains("READY=1"))
      assert(states.contains("WATCHDOG=1"))
      // every datagram targets the configured socket
      assert(rec.sent.asScala.forall(_.startsWith("/run/notify|")))
    } finally h.stop()
  }

  test("a dead liveness predicate withholds pings; recovery resumes them") {
    val rec = new Recorder
    @volatile var alive = false
    val h = SdWatchdog.start("/run/notify", watchdogUsec = 20000L, () => alive, rec.send)
    try {
      awaitUntil(() => rec.states.contains("READY=1"))
      Thread.sleep(100)
      assert(!rec.states.contains("WATCHDOG=1")) // withheld while dead
      alive = true
      awaitUntil(() => rec.states.contains("WATCHDOG=1"))
      assert(rec.states.contains("WATCHDOG=1"))
    } finally h.stop()
  }

  test("stop() ends the loop; no pings arrive after") {
    val rec = new Recorder
    val h = SdWatchdog.start("/run/notify", watchdogUsec = 20000L, () => true, rec.send)
    awaitUntil(() => rec.states.contains("READY=1"))
    h.stop() // joins the ping thread
    val after = rec.sent.size()
    Thread.sleep(150)
    assert(rec.sent.size() == after)
  }

  test("fromEnv: no-op outside systemd, handle inside") {
    assert(SdWatchdog.fromEnv(() => true, _ => None).isEmpty)
    val rec = new Recorder
    val env = Map("NOTIFY_SOCKET" -> "/run/sock", "WATCHDOG_USEC" -> "40000")
    val h = SdWatchdog.fromEnv(() => true, env.get, rec.send)
    assert(h.isDefined)
    try {
      awaitUntil(() => rec.states.contains("READY=1"))
      assert(rec.states.contains("READY=1"))
    } finally h.foreach(_.stop())
    // disabled watchdog (USEC=0) → no-op
    assert(SdWatchdog.fromEnv(() => true,
      Map("NOTIFY_SOCKET" -> "/tmp/x", "WATCHDOG_USEC" -> "0").get).isEmpty)
  }

  test("notify never throws at a dead socket path or absent helper") {
    assert(!SdWatchdog.notify("/nonexistent/dir/sock", "READY=1"))
    assert(!SdWatchdog.notifyViaChannel("/nonexistent/dir/sock", "READY=1"))
    assert(!SdWatchdog.notifyViaHelper("/nonexistent/dir/sock", "READY=1"))
  }
}
