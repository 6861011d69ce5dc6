package graft.source

import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, SupportsAdmissionControl}

/** Test-tree bridge: [[TransportMicroBatch]] is `private[source]`, so
  * specs outside this package (HealthServerSpec's lag gauge) construct
  * one through here and drive it via the public DSv2 interfaces. */
object TransportTestKit {
  def microBatch(t: SourceTransport, maxDocs: Int, lagKey: String)
      : MicroBatchStream with SupportsAdmissionControl =
    new TransportMicroBatch(t, maxDocs, lagKey)
}
