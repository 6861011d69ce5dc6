package graft.operators

import org.apache.spark.sql.DataFrame

/** A1: server-side aggregation-pipeline pushdown, the `[[pipeline]]`
  * config surface (buildPipe, monstache.go:4336-4386). Per-namespace
  * (plus global `""`) pipeline builders produce the stages injected into
  * the source; a builder receives `(namespace, changeEvent)` because
  * change streams and direct reads may want different stages — the JS
  * pipeline function's second argument (monstache.go:4357-4377). Global
  * stages run before namespace stages, the same chain order as the
  * mapper/filter registries (4343).
  *
  * The Spark re-expression: a "stage" is a declarative transform applied
  * AT THE SOURCE, before any other operator. Because the stages are
  * ordinary Catalyst operators, a `$match` becomes a pushed filter in the
  * parquet/connector scan (`PushedFilters` in the plan) and a `$project`
  * prunes the read schema — the same effect as MongoDB executing the
  * pipeline server-side: bytes that the pipeline excludes are never read.
  * PlanAuditSpec pins this property.
  */
case class PipelineRegistry(
    builders: Map[String, (String, Boolean) => Seq[DataFrame => DataFrame]]) {

  /** Stages for `ns` on the change-stream (`changeEvent = true`) or
    * direct-read path, in global-then-namespace order. */
  def stages(ns: String, changeEvent: Boolean): Seq[DataFrame => DataFrame] =
    Seq("", ns).distinct.flatMap(builders.get).flatMap(b => b(ns, changeEvent))

  /** Apply the configured pipeline to a source frame. */
  def apply(source: DataFrame, ns: String, changeEvent: Boolean): DataFrame =
    stages(ns, changeEvent).foldLeft(source)((df, stage) => stage(df))
}
