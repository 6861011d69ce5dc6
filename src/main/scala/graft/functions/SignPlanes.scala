package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

import graft.llm.TextHash

/** Native one-pass plane algebra over an `array<double>` vector against a
  * FIXED ±1 (Rademacher) hyperplane matrix — the fused form of the
  * sign-LSH / JL-projection column stacks in [[graft.llm.Similarity]].
  *
  * Why this exists (round-16 optimization measurement): the previous
  * column form built `__bits` as an `array(64 × when(graft_dot(v, lit) >=
  * 0, 1, 0))` alias and then derived band keys from SIXTY-FOUR separate
  * `col("__bits")(i)` references in the next projection. Catalyst's
  * CollapseProject substitutes the alias's whole defining tree into every
  * reference, so the 64-dot array was re-evaluated 64 times per row —
  * O(planes² · dim) work instead of O(planes · dim) (measured: the
  * signing pass alone cost ~20 executor-CPU seconds on a 6.2k-row corpus
  * at sf0.1; q144's projected variant re-evaluated a 16-dot JL projection
  * 64× per row the same way). One expression consumes the vector ONCE and
  * emits the final value, so there is no alias for the optimizer to
  * duplicate, and the matrix lives in a reference object instead of 64
  * literal arrays.
  *
  * The matrix is regenerated from the same md5-parity formula as
  * [[graft.llm.Similarity.signMatrix]] / `jlMatrix` (namespace "rp" /
  * "jl") — SignPlanesSpec pins the two constructions equal, and the
  * DuckDB oracle's SQL twins are untouched. Per-plane dots accumulate in
  * the same left-to-right element order as [[DotProduct]], so every
  * number (and therefore every downstream band key and verified pair) is
  * bit-identical to the column form it replaces.
  *
  * Modes (exactly the column algebra they replace):
  *  - proj: array<double> of the `rows` plane dots — `randomProject`'s
  *    output. A broken vector (length ≠ dim, or any NULL element — both
  *    made a [[DotProduct]] return NULL per plane) yields all-NULL
  *    elements, as the per-plane dots did.
  *  - bits: array<long> of `rows` sign bits, bit = dot >= 0 under Java
  *    primitive comparison. NaN → false → 0; note Spark's own `>=`
  *    ORDERS NaN above every double (NaN >= 0 is true there), so a NaN
  *    dot is the one input the two comparisons disagree on. Inputs pass
  *    [[graft.llm.Similarity.cleanVec]] (finite elements only), so a NaN
  *    dot would require ±Inf overflow CANCELLATION across the ±1-plane
  *    sum — products of ~1e154-magnitude elements — which no embedding
  *    in this engine carries; the corner is documented as out of
  *    contract rather than claimed Spark-`>=`-equivalent. A NULL dot
  *    took the `otherwise(0)` branch
  *    in the replaced column form, so broken vectors yield all-zero
  *    bits.
  *  - keys: array<long> of `bands` band keys, key_b = Σ_r bit(b·rpb+r)·2^r
  *    — the bits mode folded straight into keys, never materializing bits.
  */
case class SignPlanes(child: Expression, ns: String, rows: Int, dim: Int,
                      bands: Int, mode: String) extends UnaryExpression {
  require(rows >= 1 && dim >= 1, s"rows=$rows dim=$dim")
  require(mode == "proj" || mode == "bits" || mode == "keys", mode)
  require(mode != "keys" || (bands >= 1 && rows % bands == 0),
    s"keys mode: bands=$bands must divide rows=$rows")

  /** Flattened rows×dim ±1 matrix — [[graft.llm.Similarity.signMatrix]]'s
    * formula verbatim (namespace parameterized: "rp" for sign-LSH, "jl"
    * for JL projection). */
  lazy val matrix: Array[Double] = {
    val m = new Array[Double](rows * dim)
    var j = 0
    while (j < rows) {
      var i = 0
      while (i < dim) {
        m(j * dim + i) =
          if (TextHash.h32pScala(s"$ns:$j:$i") % 2 == 0) 1.0 else -1.0
        i += 1
      }
      j += 1
    }
    m
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> input, got ${dt.simpleString}")
  }
  override def dataType: DataType = mode match {
    case "proj" => ArrayType(DoubleType, containsNull = true)
    case _ => ArrayType(LongType, containsNull = false)
  }
  override def prettyName: String = s"graft_plane_$mode"
  override def nullable: Boolean = true

  private def outLen = if (mode == "keys") bands else rows

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    var broken = v.numElements() != dim
    if (!broken) {
      var i = 0
      while (i < dim && !broken) { broken = v.isNullAt(i); i += 1 }
    }
    if (broken) {
      if (mode == "proj") new GenericArrayData(new Array[Any](rows))
      else new GenericArrayData(new Array[Long](outLen))
    } else {
      val dots = new Array[Double](rows)
      var j = 0
      while (j < rows) {
        var acc = 0.0d
        var i = 0
        while (i < dim) { acc += v.getDouble(i) * matrix(j * dim + i); i += 1 }
        dots(j) = acc
        j += 1
      }
      mode match {
        case "proj" => new GenericArrayData(dots)
        case "bits" =>
          new GenericArrayData(dots.map(d => if (d >= 0.0) 1L else 0L))
        case "keys" =>
          val rpb = rows / bands
          val keys = new Array[Long](bands)
          var b = 0
          while (b < bands) {
            var k = 0L
            var r = 0
            while (r < rpb) {
              if (dots(b * rpb + r) >= 0.0) k += (1L << r)
              r += 1
            }
            keys(b) = k
            b += 1
          }
          new GenericArrayData(keys)
      }
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("planeMat", matrix, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val broken = ctx.freshName("broken")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val dots = ctx.freshName("dots")
      val out = ctx.freshName("out")
      val gad = "org.apache.spark.sql.catalyst.util.GenericArrayData"
      val body = mode match {
        case "proj" =>
          s"${ev.value} = new $gad($dots);"
        case "bits" =>
          s"""long[] $out = new long[$rows];
             |for (int $j = 0; $j < $rows; $j++)
             |  $out[$j] = $dots[$j] >= 0.0 ? 1L : 0L;
             |${ev.value} = new $gad($out);""".stripMargin
        case "keys" =>
          val rpb = rows / bands
          val b = ctx.freshName("b")
          val r = ctx.freshName("r")
          val k = ctx.freshName("k")
          s"""long[] $out = new long[$bands];
             |for (int $b = 0; $b < $bands; $b++) {
             |  long $k = 0L;
             |  for (int $r = 0; $r < $rpb; $r++)
             |    if ($dots[$b * $rpb + $r] >= 0.0) $k += (1L << $r);
             |  $out[$b] = $k;
             |}
             |${ev.value} = new $gad($out);""".stripMargin
      }
      val brokenOut =
        if (mode == "proj") s"new $gad(new Object[$rows])"
        else s"new $gad(new long[$outLen])"
      s"""
         |boolean $broken = $v.numElements() != $dim;
         |if (!$broken) {
         |  for (int $i = 0; $i < $dim && !$broken; $i++)
         |    $broken = $v.isNullAt($i);
         |}
         |if ($broken) {
         |  ${ev.value} = $brokenOut;
         |} else {
         |  double[] $dots = new double[$rows];
         |  for (int $j = 0; $j < $rows; $j++) {
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $dim; $i++)
         |      $acc += $v.getDouble($i) * $matRef[$j * $dim + $i];
         |    $dots[$j] = $acc;
         |  }
         |  $body
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SignPlanes =
    copy(child = newChild)
}
