package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-vector int8 (0-255) min-max quantization of embedding columns —
  * the memory side of ANN at scale: a 64-dim float32 vector is 256 bytes,
  * its quantized form 64 bytes + two scale doubles, a 4× cut in what an
  * IVF index must hold hot for probe scans. Quantization here is a
  * storage/recall trade for the CANDIDATE side only; re-ranking the final
  * k hits re-reads exact vectors (the standard IVF-int8 arrangement).
  *
  * All narrow column algebra. `floor` (not `round`) keeps the code point
  * deterministic across engines — IEEE double math is bit-identical on
  * both sides, and floor avoids the half-even-vs-half-away ambiguity.
  * A flat vector (max == min) quantizes to all-zero codes; NULL vectors
  * and NULL elements pass through as NULL codes (the quarantine
  * convention of [[Similarity]]).
  */
object Quantize {

  val Levels = 255

  /** Adds `q_codes` (array<int>, 0-255), `q_min`, `q_scale` — the
    * dequantization pair (`x ≈ q_min + code · q_scale`). */
  def withQuantized(vectors: DataFrame,
                    vecCol: String = "embedding"): DataFrame = {
    val v = transform(col(vecCol), x => x.cast("double"))
    val mn = array_min(v)
    val mx = array_max(v)
    val scale = (mx - mn) / lit(Levels.toDouble)
    vectors
      .withColumn("q_min", mn)
      .withColumn("q_scale", scale)
      .withColumn("q_codes",
        // the finiteness guard is load-bearing: Spark (and DuckDB) order
        // NaN GREATER than every number, so `NaN > 0` is TRUE, and an
        // Inf-poisoned scale (any ±Inf element → array_max = ±Inf) also
        // passes `> 0` — either would take the quantizing branch and
        // emit garbage codes that DIVERGE between engines (Spark's
        // least() and DuckDB's treat the resulting NaN differently).
        // `s - s === 0` is the exact finiteness test: 0 for finite, NaN
        // for NaN AND ±Inf — both fall to the flat branch, whose
        // per-element guards quarantine the broken elements
        when(col("q_scale") > 0d &&
            col("q_scale") - col("q_scale") === 0d,
          transform(v, x =>
            // the isNotNull guard is load-bearing too: least() SKIPS
            // nulls (both engines), so an unguarded null element would
            // silently quantize to code 255 instead of staying null
            when(x.isNotNull,
              least(floor((x - col("q_min")) / col("q_scale")), lit(Levels))
                .cast("int"))))
          .otherwise(transform(v, x =>
            // x - x === 0 is the exact finiteness test: 0 for finite,
            // NaN (≠ 0) for NaN AND ±Infinity, NULL for null — so every
            // non-finite element quantizes to a NULL code. An Inf
            // element given code 0 would later make quantError's
            // dequantization NaN, and floor(NaN).cast(long) is an ANSI
            // error killing the whole job.
            when(x - x === 0d, lit(0)).otherwise(lit(null)))))
  }

  /** Reconstruction-error report in scaled-integer form: per-vector max
    * absolute dequantization error, `floor(err · 1e6)` so the oracle
    * compare never hashes a raw float. The bound to expect is
    * `q_scale · 1e6` (one code step). */
  def quantError(quantized: DataFrame, vecCol: String = "embedding",
                 idCol: String = "vec_id"): DataFrame = {
    val v = transform(col(vecCol), x => x.cast("double"))
    val deq = zip_with(col("q_codes"), v,
      (c, x) => abs(col("q_min") + c * col("q_scale") - x))
    quantized.select(col(idCol), col("q_min"), col("q_scale"),
      // coalesce per element: a NULL code (quarantined broken element)
      // must not null-poison the fold — DuckDB's list_sum SKIPS nulls,
      // and the whole point of the sum is auditing the non-null codes
      aggregate(col("q_codes"), lit(0L),
        (acc, c) => acc + coalesce(c, lit(0))).as("code_sum"),
      floor(coalesce(array_max(deq), lit(0d)) * 1e6).cast("long")
        .as("max_err_scaled"))
  }

  // ── DuckDB twins (same floor/least/flat-vector conventions) ───────────
  def sqlQuantized(v: String): (String, String, String) = {
    val mn = s"list_min($v)"
    val scale = s"((list_max($v) - list_min($v)) / ${Levels}.0)"
    val codes =
      s"""CASE WHEN $scale > 0 AND $scale - $scale = 0
         | THEN list_transform($v, x -> CASE WHEN x IS NULL THEN NULL
         |   ELSE CAST(least(floor((x - $mn) / $scale), $Levels) AS INT) END)
         | ELSE list_transform($v, x -> CASE WHEN x - x = 0 THEN 0 ELSE NULL END) END""".stripMargin
        .replaceAll("\n", "")
    (mn, scale, codes)
  }
}
