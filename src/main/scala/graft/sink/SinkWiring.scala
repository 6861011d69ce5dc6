package graft.sink

import org.apache.spark.sql.DataFrame

/** Everything the daemon's `--sink` mode needs beyond the TOML config: a
  * constructed [[SinkBackend]] (an [[EsSinkBackend]] over a real
  * transport in a deployment, the in-memory backend in specs) plus the
  * relate/file `collections` frames — both are live objects a CLI string
  * can't carry, so a deployment `main` builds them and registers the
  * wiring under a key exactly like [[graft.source.SourceTransports]]
  * does for the source side. */
final case class SinkWiring(
    backend: SinkBackend,
    collections: Map[String, DataFrame] = Map.empty,
    fileContentCol: String = "file_content")

/** In-process registry selecting a [[SinkWiring]] by `--sink KEY`. */
object SinkWirings {
  private val reg =
    new java.util.concurrent.ConcurrentHashMap[String, SinkWiring]()

  def register(key: String, w: SinkWiring): Unit = reg.put(key, w)

  def unregister(key: String): Unit = reg.remove(key)

  def lookup(key: String): SinkWiring = {
    val w = reg.get(key)
    require(w != null,
      s"SinkWirings: no sink wiring registered under '$key' — call " +
        "SinkWirings.register(key, SinkWiring(backend, ...)) before " +
        "starting the daemon")
    w
  }
}
