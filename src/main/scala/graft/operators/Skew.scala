package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose hot keys AQE cannot fix.
  *
  * AQE's skew-join split handles sort-merge joins, and broadcast removes
  * the shuffle entirely when one side is small — those are the first-line
  * answers. The remaining case is a both-big equi-join where one key
  * holds a disproportionate share of rows (the reference's analog: one
  * namespace receiving most of the oplog): every row of the hot key
  * lands on one reducer regardless of cluster size.
  *
  * Salting fixes the layout deterministically: the skewed side's key
  * becomes (key, hash(rowId) % S) — the hot key's rows spread over S
  * reducers — and the other side is replicated S ways so every salted
  * row still meets its match. Cost: S× the small side's shuffle volume,
  * bought for an S× cut in worst-key reducer load. Deterministic salt
  * (hash of a row-unique column, never rand()) keeps retries and
  * replays idempotent — the same property the engine's versioning
  * depends on everywhere else.
  */
object Skew {

  /** Salted inner equi-join: `skewed` spread by `hash(uniqueCol) % salts`,
    * `other` replicated `salts` ways. Row-identical to the plain join. */
  def saltedJoin(skewed: DataFrame, other: DataFrame,
                 skewedKey: String, otherKey: String,
                 uniqueCol: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val s = skewed.withColumn("__salt",
      pmod(hash(col(uniqueCol)), lit(salts)))
    val r = other.withColumn("__salt",
      explode(array((0 until salts).map(lit(_)): _*)))
    s.alias("s").join(r.alias("r"),
        col("s." + skewedKey) === col("r." + otherKey) &&
          col("s.__salt") === col("r.__salt"))
      .drop("__salt")
  }

}
