package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingUpsert

/** The daemon lifecycle end to end, in-process: config file → parquet
  * drop-directory tail → configured hot path → versioned state, with the
  * health surface live while the stream runs and a clean teardown. Also
  * pins the arg grammar and the refuse-to-start-on-empty-source
  * contract. */
class DaemonSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val toml =
    """index-oplog-time = true
      |oplog-ts-field-name = "ots"
      |""".stripMargin

  test("arg grammar: positions, flags, errors") {
    val a = Daemon.parseArgs(Array("/c.toml", "/events", "/work",
      "--port", "0", "--interval", "5", "--once"))
    assert(a == Daemon.Args("/c.toml", "/events", "/work",
      port = 0, intervalSec = 5L, once = true))
    assert(Daemon.parseArgs(Array("a", "b", "c")) ==
      Daemon.Args("a", "b", "c"))
    intercept[IllegalArgumentException] {
      Daemon.parseArgs(Array("a", "b"))
    }
    intercept[IllegalArgumentException] {
      Daemon.parseArgs(Array("a", "b", "c", "--port"))
    }
  }

  test("--once lifecycle: drains the drop dir, serves health, tears down") {
    val eventsDir = Files.createTempDirectory("graft-daemon-events")
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      eventsDir.resolve("batch0.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val workDir = Files.createTempDirectory("graft-daemon-work").toString
    val cfgPath = Files.createTempDirectory("graft-daemon-cfg")
      .resolve("graft.toml")
    Files.writeString(cfgPath, toml)

    val running = Daemon.start(spark, Daemon.Args(
      cfgPath.toString, eventsDir.toString, workDir, port = 0, once = true))
    try {
      // health surface is live while the stream runs
      val http = HttpClient.newHttpClient()
      def get(path: String) = http.send(
        HttpRequest.newBuilder(URI.create(
          s"http://127.0.0.1:${running.health.port}$path")).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(get("/healthz").statusCode() == 200)
      assert(get("/config").body().contains("index-oplog-time"))

      running.query.awaitTermination() // AvailableNow: drains and stops
      val state = StreamingUpsert.latestState(spark, s"$workDir/state")
      assert(state.isDefined)
      assert(state.get.count() > 0)
      // the configured hot path ran: oplog-time injection renamed the
      // ts field per the TOML
      assert(state.get.columns.contains("ots"))
    } finally running.close()
  }

  test("an empty events dir refuses to start (schema pin, loud)") {
    val emptyDir = Files.createTempDirectory("graft-daemon-empty").toString
    val cfgPath = Files.createTempDirectory("graft-daemon-cfg2")
      .resolve("graft.toml")
    Files.writeString(cfgPath, toml)
    intercept[org.apache.spark.sql.AnalysisException] {
      Daemon.start(spark, Daemon.Args(cfgPath.toString, emptyDir,
        Files.createTempDirectory("graft-daemon-work2").toString,
        port = 0, once = true))
    }
  }
}
