package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

import graft.llm.TextHash

/** Native position-weighted document fingerprint: words →
  * `Σ h32p(word_i) · ((i mod 64) + 1)`, then mod P — the order-sensitive
  * fingerprint of TextAnalysis.withFingerprint. The column form
  * (`aggregate(transform(ws, (w,i) => h32p(w)·((i%64)+1)), 0L, +)`) runs
  * two interpreted HOF lambdas per word and routes every hash through
  * the 32-char-hex `conv` path; this is one digest-and-accumulate pass.
  *
  * Parity contract with the replaced fold, bit for bit: the running sum
  * is PLAIN long addition (wrapping, like Spark's non-ANSI add) with the
  * single mod P applied at the end, and Java's signed `%` then matches
  * Spark's `pmod`-free `%` on a wrapped-negative sum. Null array → null;
  * a null ELEMENT nulls the whole fingerprint (null poisons the old
  * fold's accumulator). */
case class PosWeightedFp(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${dt.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_pos_fp"
  override def nullable: Boolean = true

  /** Boxed so a null element can null the result through one dispatch. */
  def fingerprint(ws: ArrayData): java.lang.Long = {
    val n = ws.numElements()
    val md = HashedShingles.localDigest()
    var sum = 0L
    var i = 0
    while (i < n) {
      if (ws.isNullAt(i)) return null
      sum += HashedShingles.h32(md, ws.getUTF8String(i)) * ((i % 64) + 1)
      i += 1
    }
    java.lang.Long.valueOf(sum % TextHash.P)
  }

  override def nullSafeEval(input: Any): Any =
    fingerprint(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("posFp", this, classOf[PosWeightedFp].getName)
    val boxed = ctx.freshName("boxed")
    nullSafeCodeGen(ctx, ev, ws =>
      s"""
         |java.lang.Long $boxed = $ref.fingerprint($ws);
         |if ($boxed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $boxed.longValue();
         |}
       """.stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): PosWeightedFp = copy(child = newChild)
}
