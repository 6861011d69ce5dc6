package graft.streaming

import java.net.{HttpURLConnection, URL}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.source.ChangeEvent

/** The /healthz–/stats daemon surface: listener-derived liveness and
  * counters served over loopback HTTP, fed by a real streaming query
  * with the observed bulk_stats metrics. */
class HealthServerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def get(port: Int, path: String): (Int, String) = {
    val conn = new URL(s"http://127.0.0.1:$port$path")
      .openConnection().asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(5000)
    conn.setReadTimeout(5000)
    val code = conn.getResponseCode
    val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val body = scala.io.Source.fromInputStream(is, "UTF-8").mkString
    conn.disconnect()
    (code, body)
  }

  private def eventually[T](timeoutMs: Long = 20000)(body: => T): T = {
    val deadline = System.currentTimeMillis() + timeoutMs
    var last: Throwable = null
    while (System.currentTimeMillis() < deadline) {
      try return body
      catch { case e: Throwable => last = e; Thread.sleep(100) }
    }
    throw last
  }

  test("healthz/started/stats/config reflect a live query's progress") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val handle = HealthServer.start(spark, port = 0,
      configToml = "namespace-regex = '^app'")
    try {
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-health-ckpt").toString
      val s = MemoryStream[ChangeEvent]
      s.addData(Seq(
        ChangeEvent(0L, "1", "app", "t0", "app.t0", "i", 1000L, 1L,
          """{"a":1}""", 0.0, "oplog"),
        ChangeEvent(1L, "1", "app", "t0", "app.t0", "d", 2000L, 2L,
          null, 0.0, "oplog")))
      val q = RetryingSink.withBulkStats(s.toDF()).writeStream
        .queryName("health-probe")
        .option("checkpointLocation", ckpt)
        .format("noop")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()

      // listener events are delivered async — poll until the batch lands
      eventually() {
        val (code, body) = get(handle.port, "/stats")
        assert(code == 200)
        assert(body.contains(""""name":"health-probe""""))
        assert(body.contains(""""input_rows":2"""))
        assert(body.contains(""""indexed":1"""))
        assert(body.contains(""""deleted":1"""))
        assert(body.contains(""""errored":false"""))
      }
      // a cleanly-terminated AvailableNow query stays healthy
      eventually() {
        assert(get(handle.port, "/stats")._2.contains(""""terminated":true"""))
        val (code, body) = get(handle.port, "/healthz")
        assert(code == 200 && body == "ok")
      }
      val (sc, sb) = get(handle.port, "/started")
      assert(sc == 200 && sb.contains("uptime_sec"))
      val (cc, cb) = get(handle.port, "/config")
      assert(cc == 200 && cb == "namespace-regex = '^app'")
    } finally handle.close()
  }

  test("/sources surfaces transport lag rising and falling") {
    import graft.source._
    TransportLag.reset()
    val handle = HealthServer.start(spark, port = 0)
    try {
      // no transport polled yet: empty gauge list
      assert(get(handle.port, "/sources") == (200, "[]"))

      val log = (0 until 30).map { i =>
        ChangeEvent(i.toLong, i.toString, "app", "t0", "app.t0", "i",
          1000L + i, i.toLong, s"""{"k":$i}""", 0.0, "oplog")
      }
      val t = new SourceTransport {
        override def poll(tok: Option[String], maxDocs: Int): SourceBatch = {
          val from = tok.map(_.toInt).getOrElse(0)
          val evs = log.slice(from, from + maxDocs)
          SourceBatch(evs, (from + evs.length).toString)
        }
      }
      val s = TransportTestKit.microBatch(t, 20, lagKey = "lag-probe")
      val start = s.initialOffset()
      val end = s.latestOffset(start,
        org.apache.spark.sql.connector.read.streaming.ReadLimit.maxRows(20))

      // polled-but-uncommitted: pending rises — the wedged-sink signature
      val (c1, b1) = get(handle.port, "/sources")
      assert(c1 == 200)
      assert(b1.contains(""""transport":"lag-probe""""))
      assert(b1.contains(""""docs_polled":20"""))
      assert(b1.contains(""""docs_pending":20"""))
      assert(b1.contains(""""commit_age_ms":-1"""), "no commit yet")

      // the batch commits: pending falls back to zero, commit age appears
      s.commit(end)
      val (_, b2) = get(handle.port, "/sources")
      assert(b2.contains(""""docs_committed":20"""))
      assert(b2.contains(""""docs_pending":0"""))
      assert(!b2.contains(""""commit_age_ms":-1"""))
      assert(b2.contains(""""last_token":"20""""))

      // the tail of the log: pending rises 0 → 10, falls again on commit
      val end2 = s.latestOffset(end,
        org.apache.spark.sql.connector.read.streaming.ReadLimit.maxRows(20))
      assert(get(handle.port, "/sources")._2.contains(""""docs_pending":10"""))
      s.commit(end2)
      // a truly idle poll: counters hold, poll age refreshes (liveness
      // of the tail loop even when no data moves)
      val idle = s.latestOffset(end2,
        org.apache.spark.sql.connector.read.streaming.ReadLimit.maxRows(20))
      assert(idle == end2)
      val (_, b3) = get(handle.port, "/sources")
      assert(b3.contains(""""docs_polled":30"""))
      assert(b3.contains(""""docs_pending":0"""))
    } finally { handle.close(); TransportLag.reset() }
  }

  test("a stale live query flips healthz to 503; an errored one too") {
    val listener = new HealthServer.Listener(clock = () => 1000000L)
    // a live query whose last progress is 60 s old
    listener.stats("q1") = HealthServer.QueryStats(
      "stuck", "q1", 5L, 10L, 0L, 0L, 100L,
      lastProgressAtMs = 1000000L - 60000L, terminated = false, error = None)
    assert(listener.healthy(staleAfterMs = 0L))        // staleness off
    assert(listener.healthy(staleAfterMs = 120000L))   // within budget
    assert(!listener.healthy(staleAfterMs = 30000L))   // stalled
    // terminated cleanly → healthy regardless of age
    listener.stats("q1") = listener.stats("q1").copy(terminated = true)
    assert(listener.healthy(staleAfterMs = 30000L))
    // errored → unhealthy, full stop
    listener.stats("q1") = listener.stats("q1")
      .copy(error = Some("boom"))
    assert(!listener.healthy(staleAfterMs = 0L))
  }
}
