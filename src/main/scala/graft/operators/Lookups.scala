package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Script-lookup builtins (J4/J5): `findId`/`findOne` point lookups with
  * optional projection (monstache.go:3954-3970, conf 3666-3721). The
  * reference issues a per-call MongoDB query from inside user JS; the
  * set-oriented re-expression is a broadcast join of the (small) key set
  * against the lookup collection — one pass, no per-row RPC. */
object Lookups {

  /** findId: exact-id lookup with projection. Keys are broadcast; rows
    * with no match are absent (the builtin returns null → caller drops). */
  def findId(keys: DataFrame, collection: DataFrame, idCol: String,
             select: Seq[String]): DataFrame =
    collection.join(broadcast(keys), Seq(idCol), "left_semi")
      .select((idCol +: select.filterNot(_ == idCol)).map(col): _*)

  /** findOne: first match of a predicate under a deterministic sort —
    * per-group min via max_by/min_by (partial-aggregating; no window
    * shuffle-and-sort). Determinism holds only when the ordering key is
    * unique per group: pass `tieBreak` columns (e.g. the unique id) when
    * `sortCol` alone can tie, or min_by picks whichever partial
    * aggregate wins — an answer that changes with partitioning. */
  def findOne(collection: DataFrame, groupCol: String, sortCol: String,
              select: Seq[String], tieBreak: Seq[String] = Nil): DataFrame = {
    val payload = struct(select.map(col): _*)
    collection.groupBy(col(groupCol))
      .agg(min_by(payload, struct((sortCol +: tieBreak).map(col): _*)).as("doc"))
      .select(col(groupCol) +: select.filterNot(_ == groupCol)
        .map(c => col(s"doc.$c").as(c)): _*)
  }
}
