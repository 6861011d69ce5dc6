package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Namespace filter chain (SURVEY §2.2 F1-F4).
  *
  * The reference applies, in order: system-namespace guards
  * (monstache.go:1435-1452), an include regex that drop-ops always pass
  * (1454-1462), an exclude regex (1531-1539), and a separate include/exclude
  * pair that applies only to drop ops (1464-1472, 1541-1549).
  *
  * All of it is a single conjunctive predicate here, so Catalyst pushes it
  * into the scan — at 100 TB this is the difference between reading one
  * namespace's row groups and reading everything.
  */
case class NamespaceFilterConfig(
    include: Option[String] = None,
    exclude: Option[String] = None,
    dropInclude: Option[String] = None,
    dropExclude: Option[String] = None,
    configDb: String = "monstache")

object NamespaceFilter {

  private val isDropOp: Column =
    col("operation").isin("drop_db", "drop_coll")

  /** F1: config db, `config` db, `system.*` collections, GridFS chunks
    * (regexes at monstache.go:86-87). */
  def systemGuard(cfg: NamespaceFilterConfig): Column = {
    val ns = col("namespace")
    !ns.startsWith(cfg.configDb + ".") &&
      !ns.startsWith("config.") &&
      !ns.rlike("^[^.]+\\.system\\..*") &&
      !ns.rlike("^[^.]+\\..+\\.chunks$")
  }

  /** F2-F4 chain as one boolean column over (namespace, operation). */
  def predicate(cfg: NamespaceFilterConfig): Column = {
    val ns = col("namespace")
    // drops always pass the data include-regex (monstache.go:1456: the
    // filter returns true for op.IsDrop())
    val inc = cfg.include.map(re => isDropOp || ns.rlike(re)).getOrElse(lit(true))
    val exc = cfg.exclude.map(re => isDropOp || !ns.rlike(re)).getOrElse(lit(true))
    val dInc = cfg.dropInclude.map(re => !isDropOp || ns.rlike(re)).getOrElse(lit(true))
    val dExc = cfg.dropExclude.map(re => !isDropOp || !ns.rlike(re)).getOrElse(lit(true))
    systemGuard(cfg) && inc && exc && dInc && dExc
  }

  def apply(df: DataFrame, cfg: NamespaceFilterConfig): DataFrame =
    df.filter(predicate(cfg))
}
