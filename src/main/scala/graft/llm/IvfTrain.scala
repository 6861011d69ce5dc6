package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lloyd's k-means training for IVF centroids — the difference between
  * demo-ANN (centroids picked by predicate) and usable-ANN (centroids that
  * follow the data's density, so buckets balance and probes recall more).
  *
  * The loop is the standard scalable shape (the same one MLlib's k-means
  * and [[Dedup.dupClusters]] use): per iteration, one narrow map-side
  * assignment pass against broadcast centroids, one partially-aggregated
  * groupBy producing k·dim tiny rows, and a driver-side collect of just
  * those k·dim sums to rebuild the centroid array. Nothing data-sized ever
  * reaches the driver, and no lineage accumulates across iterations (each
  * round's frame is rebuilt from the source scan + the new broadcast).
  *
  * Determinism across engines (the oracle replays the same iterations in
  * SQL): per-dimension sums are computed on `floor(x·1e6)` integers, so
  * accumulation order cannot change the result (long addition is
  * associative; double addition is not), and the mean is re-derived as
  * `sum.toDouble / (1e6 · n)` — one double division, bit-identical on both
  * engines. Assignment uses the cosine argmax of [[Similarity.ivfAssign]]
  * (ties to the lower centroid id), matching the probe metric — spherical-
  * style k-means. Buckets that receive no vectors drop out of the next
  * round (mirrors the SQL GROUP BY); with data-dense init that does not
  * happen in practice.
  */
object IvfTrain {

  /** Scale factor for the order-free integer coordinate sums. */
  val Scale = 1e6

  /** One Lloyd's update: assign every vector to its nearest current
    * centroid, then move each centroid to its bucket's mean. */
  private def step(vectors: DataFrame, cents: Array[Centroid],
                   idCol: String, vecCol: String): Array[Centroid] = {
    val sums = Similarity.ivfAssign(vectors, cents, idCol, vecCol)
      // zero-norm/NULL vectors sit in the unassignable bucket; folding
      // them in would fabricate a bogus zero centroid the SQL replay
      // (whose assignment CTE drops NaN rows) never sees
      .filter(col("bucket") =!= Similarity.UnassignedBucket)
      .select(col("bucket"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("bucket"), col("pos"))
      .agg(sum(floor(col("x") * Scale).cast("long")).as("s"),
        count(lit(1)).as("n"))
      .collect()
    sums.groupBy(_.getLong(0)).map { case (b, rows) =>
      val coords = rows.sortBy(_.getInt(1))
        .map(r => r.getLong(2).toDouble / (Scale * r.getLong(3)))
      Centroid(b, coords, math.sqrt(Similarity.dotArr(coords, coords)))
    }.toArray.sortBy(_.id)
  }

  /** Train centroids from a seed set for a fixed number of iterations
    * (fixed, not converged-tested, so the oracle can replay the exact
    * schedule). */
  def train(vectors: DataFrame, init: Array[Centroid], iters: Int,
            idCol: String = "vec_id",
            vecCol: String = "embedding"): Array[Centroid] =
    (1 to iters).foldLeft(init)((c, _) => step(vectors, c, idCol, vecCol))

  /** Predicate-seeded convenience: seed centroids from matching rows. */
  def train(vectors: DataFrame, initPred: Column, iters: Int,
            idCol: String, vecCol: String): Array[Centroid] =
    train(vectors,
      Similarity.collectCentroids(vectors.filter(initPred), idCol, vecCol),
      iters, idCol, vecCol)

  /** Integer fingerprint of a centroid: sum over dims of floor(coord·1e6).
    * Cross-engine stable (same double ops, then exact integer sum). */
  def fingerprint(c: Centroid): Long =
    c.vec.map(x => math.floor(x * Scale).toLong).sum

  /** DuckDB twin of [[train]] with 2 iterations: the CTE chain
    * `c0 → a1 → u1 → c1 → a2 → u2 → c2` replaying the exact schedule —
    * integer-scaled sums, listed means, same assignment argmax. Requires
    * an `e(vec_id, v)` CTE in scope; `initWhere` selects the seed rows
    * of `e`. The final centroids are CTE `c2(centroid_id, cv)`. */
  def sqlTrainCtes(initWhere: String, dim: Int): String = {
    // count(v[i]), not count(*): the Spark step's posexplode emits one
    // row per PRESENT element, so a vector shorter than `dim` must not
    // inflate the divisor on the SQL side (count(expr) skips NULLs)
    def update(a: String) =
      s"""SELECT bucket, i, SUM(CAST(floor(v[i]*1000000) AS BIGINT)) AS s, count(v[i]) AS n
         |    FROM $a, unnest(range(1, ${dim + 1})) AS t(i) GROUP BY bucket, i""".stripMargin
    val mean = "list(CAST(s AS DOUBLE)/(1000000.0*n) ORDER BY i)"
    s"""c0 AS (SELECT vec_id AS centroid_id, v AS cv FROM e WHERE $initWhere),
       |a1 AS (${Similarity.sqlIvfAssign("e", "c0", dim)}),
       |u1 AS (${update("a1")}),
       |c1 AS (SELECT bucket AS centroid_id, $mean AS cv FROM u1 GROUP BY bucket),
       |a2 AS (${Similarity.sqlIvfAssign("e", "c1", dim)}),
       |u2 AS (${update("a2")}),
       |c2 AS (SELECT bucket AS centroid_id, $mean AS cv FROM u2 GROUP BY bucket)""".stripMargin
  }

  /** Post-training summary frame: EVERY trained centroid joined to its
    * final assignment count — the bucket-balance report an IVF build
    * would log (and the cross-engine-checkable output of q56). Left join
    * from the centroid side: a trained centroid that captures zero
    * vectors in the final assignment is exactly the imbalance signal the
    * report exists to surface, and an inner join would drop it. */
  def balance(vectors: DataFrame, trained: Array[Centroid],
              idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    val spark = vectors.sparkSession
    val fps = spark.createDataFrame(
      trained.toSeq.map(c => (c.id, fingerprint(c))))
      .toDF("bucket", "c_fp")
    val counts = Similarity.ivfAssign(vectors, trained, idCol, vecCol)
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_assigned"))
    fps.join(counts, Seq("bucket"), "left")
      .select(col("bucket").cast("long"),
        coalesce(col("n_assigned"), lit(0L)).cast("long").as("n_assigned"),
        col("c_fp"))
  }
}
