package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Brute-force is the correctness baseline: broadcast the (small) query
  * set against every candidate — one pass over the data, no shuffle of the
  * big side, top-k per query via window. The scale path is IVF: vectors
  * are bucketed by nearest centroid once (a narrow pass against a
  * broadcast centroid table), and a query probes only its `nprobe`
  * closest centroids' buckets — the classic inverted-file trade of recall
  * for a ~buckets/nprobe scan reduction. At 100 TB the bucket column
  * becomes the partition key so a probe is partition-pruned I/O, not a
  * scan.
  *
  * All arithmetic is double, folded left-to-right in index order, so the
  * DuckDB oracle (same fold) produces bit-identical cosines.
  */
object Similarity {

  /** Left-fold dot product of two double-array columns, backed by the
    * engine's native codegen expression [[graft.functions.DotProduct]]
    * (`aggregate(zip_with(...))` is interpreted and a Scala UDF boxes
    * every element; the custom Expression splices a primitive loop into
    * whole-stage codegen). Same left-to-right accumulation order as the
    * DuckDB oracle's `list_sum(list_transform(...))` — bit-identical.
    * Requires [[graft.GraftSession.ensure]] on sessions the library did
    * not build. */
  def dot(x: Column, y: Column): Column =
    call_function(graft.functions.GraftFunctions.DotName, x, y)

  /** Elementwise-fold cosine between two double-array columns. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Cosine when each side's norm is already a column. Precomputing the
    * norm once per vector (instead of once per pair) removes 2 of the 3
    * array folds from every pair comparison — at n·m pairs that is the
    * dominant cost. Identical arithmetic to [[cosine]]: the same fold and
    * sqrt, evaluated once. */
  def cosinePre(a: Column, na: Column, b: Column, nb: Column): Column =
    dot(a, b) / (na * nb)

  private def norm(v: Column): Column = sqrt(dot(v, v))

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Brute-force top-k cosine neighbors for a query subset.
    * `queryPred` selects the query rows (small!); the query side is
    * broadcast so the candidate scan never shuffles. */
  def bruteForceTopK(embeddings: DataFrame, queryPred: Column, k: Int,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val cands = embeddings.select(col(idCol).as("neighbor_id"),
        asDouble(col(vecCol)).as("cv"))
      .withColumn("cn", norm(col("cv")))
    val queries = embeddings.filter(queryPred)
      .select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
      .withColumn("qn", norm(col("qv")))
    val scored = cands.join(broadcast(queries),
        col("neighbor_id") =!= col("query_id"))
      .withColumn("cos",
        cosinePre(col("qv"), col("qn"), col("cv"), col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id")
  }

  /** IVF bucket assignment: nearest centroid per vector (ties break to the
    * lower centroid id). Centroids are broadcast; one narrow pass. */
  def ivfAssign(embeddings: DataFrame, centroidPred: Column,
                idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame = {
    val cents = embeddings.filter(centroidPred)
      .select(col(idCol).as("centroid_id"), asDouble(col(vecCol)).as("cv"))
      .withColumn("cn", norm(col("cv")))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("ccos").desc, col("centroid_id").asc)
    embeddings.select(col(idCol), asDouble(col(vecCol)).as("v"))
      .withColumn("vn", norm(col("v")))
      .join(broadcast(cents), lit(true))
      .withColumn("ccos",
        cosinePre(col("v"), col("vn"), col("cv"), col("cn")))
      // drop the centroid vectors BEFORE the per-vector window: the rank
      // shuffle otherwise carries |vectors|·|centroids| copies of cv
      .select(col(idCol), col("v"), col("vn"), col("centroid_id"), col("ccos"))
      .withColumn("crank", row_number().over(w))
      .filter(col("crank") === 1)
      .select(col(idCol), col("v"), col("vn"), col("centroid_id").as("bucket"))
  }

  /** IVF probe: top-k within the query's `nprobe` nearest centroid
    * buckets. Recall < 1 by design; the oracle replicates the same probe
    * so results still hash-match. */
  def ivfTopK(embeddings: DataFrame, centroidPred: Column, queryPred: Column,
              k: Int, nprobe: Int, idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    val assigned = ivfAssign(embeddings, centroidPred, idCol, vecCol)
    val cents = embeddings.filter(centroidPred)
      .select(col(idCol).as("centroid_id"), asDouble(col(vecCol)).as("cv"))
      .withColumn("cn", norm(col("cv")))
    val queries = embeddings.filter(queryPred)
      .select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
      .withColumn("qn", norm(col("qv")))
    val wp = Window.partitionBy(col("query_id"))
      .orderBy(col("pcos").desc, col("centroid_id").asc)
    val probes = queries.join(broadcast(cents), lit(true))
      .withColumn("pcos",
        cosinePre(col("qv"), col("qn"), col("cv"), col("cn")))
      .withColumn("prank", row_number().over(wp))
      .filter(col("prank") <= nprobe)
      .select(col("query_id"), col("qv"), col("qn"),
        col("centroid_id").as("bucket"))
    val wk = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    assigned.select(col(idCol).as("neighbor_id"), col("v"), col("vn"),
        col("bucket"))
      .join(broadcast(probes), Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos",
        cosinePre(col("qv"), col("qn"), col("v"), col("vn")))
      .withColumn("rank", row_number().over(wk))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "bucket")
  }

  /** Embedding-cosine near-dedup, bucketed: vectors are IVF-assigned once,
    * and only intra-bucket pairs are scored — no all-pairs. Recall is
    * bounded by bucket purity (a near-dup pair split across buckets is
    * missed), the standard ANN-dedup trade; the oracle replays the same
    * assignment so results match exactly. The assignment is persisted
    * before the self-join (see Dedup.verifiedNearDupPairs for why). */
  def embeddingNearDupPairs(vectors: DataFrame, centroidPred: Column,
                            minCos: Double, idCol: String = "vec_id",
                            vecCol: String = "embedding"): DataFrame = {
    val assigned = ivfAssign(vectors, centroidPred, idCol, vecCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    assigned.alias("a").join(assigned.alias("b"),
        col("a.bucket") === col("b.bucket") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .withColumn("cos",
        cosinePre(col("a.v"), col("a.vn"), col("b.v"), col("b.vn")))
      .filter(col("cos") >= minCos)
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        col("a.bucket").as("bucket"),
        floor(col("cos") * 1e6).cast("long").as("cos_scaled"))
  }

  // ── DuckDB twins ──────────────────────────────────────────────────────
  /** SQL: the same left-fold cosine over two DOUBLE[] expressions.
    * DuckDB list indexing is 1-based; `dim` is the vector length. */
  def sqlCosine(a: String, b: String, dim: Int): String = {
    def dot(x: String, y: String) =
      s"CAST(list_sum(list_transform(range(1, ${dim + 1}), i -> ($x)[i] * ($y)[i])) AS DOUBLE)"
    s"(${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)})))"
  }

  /** SQL: cast a FLOAT[] column to DOUBLE[]. */
  def sqlAsDouble(c: String): String = s"list_transform($c, x -> CAST(x AS DOUBLE))"
}
