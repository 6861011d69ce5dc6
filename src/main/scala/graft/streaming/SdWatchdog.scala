package graft.streaming

/** systemd readiness + watchdog notifications for a daemon deployment —
  * the reference's `notifySd` loop (`/root/reference/monstache.go:4290-4325`:
  * `READY=1` once at startup, then `WATCHDOG=1` every
  * `WatchdogSec`/2 while alive). The sd_notify(3) protocol is just
  * datagrams of `KEY=VALUE` lines on the socket named by
  * `NOTIFY_SOCKET`; delivery tries the JDK's UNIX-domain channel first
  * and falls back to the `systemd-notify` helper binary (JEP 380 covers
  * stream sockets only — current JDKs cannot open a UNIX *datagram*
  * channel, and on a systemd host the helper is always present).
  *
  * One deliberate semantic upgrade over the reference: the reference
  * pings unconditionally while the process lives, so a wedged-but-alive
  * daemon keeps its watchdog fed; here each ping consults a liveness
  * predicate — wire it to [[HealthServer.Listener.healthy]] and a hung
  * micro-batch stops the pings, letting systemd's `WatchdogSec` restart
  * the service (the same semantics the HTTP surface gives a k8s
  * liveness probe). Pass `() => true` for reference-faithful behavior.
  *
  * Environment and transport are injected (socket path, watchdog
  * interval, the send function) so the spec pins the protocol —
  * READY-before-pings, half-interval cadence, liveness gating, stop —
  * against a recording sender; production callers use
  * [[SdWatchdog.fromEnv]], which is a silent no-op when systemd did not
  * set `NOTIFY_SOCKET` — exactly how the reference degrades outside
  * systemd.
  */
object SdWatchdog {
  import java.nio.ByteBuffer
  import java.nio.charset.StandardCharsets.UTF_8

  /** Send one sd_notify datagram to `socketPath`. Returns true when the
    * payload was accepted; never throws on delivery problems (a dead
    * supervisor must not take the pipeline down with it). */
  def notify(socketPath: String, state: String): Boolean =
    notifyViaChannel(socketPath, state) || notifyViaHelper(socketPath, state)

  /** JDK UNIX-domain datagram attempt. JEP 380 added stream channels
    * only, so on current JDKs `DatagramChannel.open(UNIX)` throws
    * UnsupportedOperationException and this returns false — kept so the
    * dependency-free path lights up the day the JDK grows support. */
  private[graft] def notifyViaChannel(socketPath: String, state: String): Boolean =
    try {
      import java.net.{StandardProtocolFamily, UnixDomainSocketAddress}
      import java.nio.channels.DatagramChannel
      val ch = DatagramChannel.open(StandardProtocolFamily.UNIX)
      try {
        val bytes = state.getBytes(UTF_8)
        ch.send(ByteBuffer.wrap(bytes), UnixDomainSocketAddress.of(socketPath)) == bytes.length
      } finally ch.close()
    } catch { case _: Throwable => false }

  /** `systemd-notify` fallback: present on every systemd host. The
    * `--pid` flag makes systemd attribute the datagram to this process
    * rather than the short-lived helper (the classic systemd-notify
    * race). */
  private[graft] def notifyViaHelper(socketPath: String, state: String): Boolean =
    try {
      val pid = ProcessHandle.current().pid()
      val pb = new ProcessBuilder("systemd-notify", s"--pid=$pid", state)
      pb.environment().put("NOTIFY_SOCKET", socketPath)
      pb.redirectErrorStream(true)
      val p = pb.start()
      p.getOutputStream.close()
      p.waitFor(2, java.util.concurrent.TimeUnit.SECONDS) && p.exitValue() == 0
    } catch { case _: Exception => false }

  /** The running watchdog: stop() ends the ping loop. */
  final class Handle(thread: Thread, stopFlag: java.util.concurrent.atomic.AtomicBoolean)
      extends AutoCloseable {
    def stop(): Unit = { stopFlag.set(true); thread.interrupt(); thread.join(2000) }
    override def close(): Unit = stop()
  }

  /** Send `READY=1`, then `WATCHDOG=1` every `watchdogUsec / 2`
    * microseconds while `alive()` holds (checked per tick; a false tick
    * SKIPS the ping but keeps the loop — liveness may recover before
    * systemd's deadline, and the decision to restart belongs to
    * systemd, not us). Daemon thread: never blocks JVM exit. */
  def start(socketPath: String, watchdogUsec: Long,
            alive: () => Boolean,
            send: (String, String) => Boolean = notify): Handle = {
    require(watchdogUsec > 0, s"SdWatchdog: watchdogUsec=$watchdogUsec")
    send(socketPath, "READY=1")
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val t = new Thread(() => {
      val intervalMs = math.max(1L, watchdogUsec / 2 / 1000L)
      while (!stop.get()) {
        try {
          Thread.sleep(intervalMs)
          if (!stop.get() && alive()) send(socketPath, "WATCHDOG=1")
        } catch { case _: InterruptedException => () }
      }
    }, "graft-sd-watchdog")
    t.setDaemon(true)
    t.start()
    new Handle(t, stop)
  }

  /** Production entry: reads `NOTIFY_SOCKET` and `WATCHDOG_USEC` like
    * sd_notify(3)/sd_watchdog_enabled(3). None (silent no-op) outside
    * systemd or with the watchdog disabled — the reference's
    * `notifySdFailed`/`watchdogSdFailed` degrade path. */
  def fromEnv(alive: () => Boolean,
              env: String => Option[String] = sys.env.get,
              send: (String, String) => Boolean = notify): Option[Handle] =
    for {
      sock <- env("NOTIFY_SOCKET")
      usec <- env("WATCHDOG_USEC").flatMap(_.toLongOption).filter(_ > 0)
    } yield start(sock, usec, alive, send)
}
