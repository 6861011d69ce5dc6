package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.RetryingSink

/** T7 sink backoff: exponential schedule with cap, recovery after
  * transient failures, loud failure when retries exhaust
  * (monstache.go:559-632). */
class RetryingSinkSpec extends AnyFunSuite {

  test("backoff doubles from base and caps (1 min → 1 h defaults)") {
    assert(RetryingSink.backoffMillis(0) == 60000L)
    assert(RetryingSink.backoffMillis(1) == 120000L)
    assert(RetryingSink.backoffMillis(5) == 1920000L)
    assert(RetryingSink.backoffMillis(6) == 3600000L) // capped
    assert(RetryingSink.backoffMillis(25) == 3600000L)
  }

  test("transient failures retry with backoff then succeed") {
    var calls = 0
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    val out = RetryingSink.withRetry(maxRetries = 5, baseMs = 10, capMs = 40,
      sleep = sleeps.append(_)) {
      calls += 1
      if (calls < 4) sys.error("transient")
      "ok"
    }
    assert(out == "ok" && calls == 4)
    assert(sleeps.toSeq == Seq(10L, 20L, 40L)) // doubling, capped at 40
  }

  test("exhausted retries rethrow (loud failure → checkpoint replay)") {
    var calls = 0
    val e = intercept[RuntimeException] {
      RetryingSink.withRetry(maxRetries = 2, baseMs = 1, sleep = _ => ()) {
        calls += 1; sys.error("down")
      }
    }
    assert(e.getMessage == "down" && calls == 3)
  }

  test("an interrupt during the BACKOFF sleep restores the flag and rethrows") {
    // the thread spends nearly all its time in the backoff sleep, so this
    // is the common interrupt path — it must not swallow cancellation
    var calls = 0
    val e = intercept[InterruptedException] {
      RetryingSink.withRetry(maxRetries = 5, baseMs = 1,
        sleep = _ => throw new InterruptedException("stop")) {
        calls += 1; sys.error("transient")
      }
    }
    assert(e.getMessage == "stop" && calls == 1)
    assert(Thread.interrupted(), "interrupt flag must be restored")
  }

  test("fatal errors and interrupts never retry (ADVICE r2)") {
    // a fatal error fails fast instead of sleeping through backoff
    var calls = 0
    intercept[OutOfMemoryError] {
      RetryingSink.withRetry(maxRetries = 5, baseMs = 1, sleep = _ => ()) {
        calls += 1; throw new OutOfMemoryError("boom")
      }
    }
    assert(calls == 1)
    // an interrupt rethrows and restores the thread's interrupt status
    var icalls = 0
    intercept[InterruptedException] {
      RetryingSink.withRetry(maxRetries = 5, baseMs = 1, sleep = _ => ()) {
        icalls += 1; throw new InterruptedException("stop")
      }
    }
    assert(icalls == 1 && Thread.interrupted()) // interrupted() also clears
  }

  test("observed bulk stats surface per-batch counters (A3/K5)") {
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq(("1", "i", 5L), ("1", "u", 6L), ("2", "d", 7L))
      .toDF("id", "operation", "version")
    val observed = RetryingSink.withBulkStats(df)
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      @volatile var metrics: Option[Map[String, Any]] = None
      def onSuccess(f: String, qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
        qe.observedMetrics.get("bulk_stats").foreach(r =>
          metrics = Some(r.getValuesMap[Any](r.schema.fieldNames)))
      def onFailure(f: String, qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      observed.write.format("noop").mode("overwrite").save()
      // listener fires asynchronously
      val deadline = System.currentTimeMillis() + 10000
      while (listener.metrics.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      val m = listener.metrics.get
      assert(m("ops") == 3L && m("deleted") == 1L && m("indexed") == 2L
        && m("max_version") == 7L)
    } finally spark.listenerManager.unregister(listener)
  }
}
