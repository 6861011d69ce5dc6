package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.functions.GraftFunctions

/** Session-build-time injection of the engine's native functions — the
  * standard Spark integration point for clusters the library does not
  * bootstrap itself:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   // or in code:
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  * }}}
  *
  * Feeds the exact same [[GraftFunctions.builders]] tuples that
  * [[GraftSession.ensure]] patches into an already-built session, so the
  * two paths cannot drift. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach(extensions.injectFunction)
}
