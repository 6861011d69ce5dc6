package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native distinct word-n-gram shingling: `array<string>` words →
  * `array<string>` of the distinct n-word windows joined by single
  * spaces, first-occurrence order — the builder feeding
  * [[HashedShingles]] on every LSH path.
  *
  * The column form (`array_distinct(transform(sequence(...), i =>
  * concat_ws(" ", slice(ws, i+1, n))))`) evaluates an interpreted lambda
  * per window, and each window allocates a sliced array before joining
  * it; `array_distinct` then re-walks the result. One fused pass here:
  * a sliding window over the words array, `UTF8String.concatWs` straight
  * from the elements (no slice copy), and a LinkedHashSet dedupe that
  * preserves exactly `array_distinct`'s keep-first order.
  *
  * Contract notes, matching the replaced form bit-for-bit:
  * - The caller guards `size(ws) >= n` (TextHash.shingles keeps its
  *   `when/otherwise` wrapper for the short-doc branch), so windows
  *   always exist here; inputs shorter than n yield the empty set.
  * - A null ELEMENT inside a window is skipped by concatWs — the same
  *   skip `concat_ws` performs — so the window still emits (never a null
  *   shingle element).
  *
  * The generated code dispatches once per row into [[buildShingles]]
  * (compiled Scala) rather than inlining the loop — the per-row work is
  * dozens of string joins, so dispatch cost is noise, and the row stays
  * inside the whole-stage-codegen span.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${dt.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  private val space = UTF8String.fromString(" ")

  def buildShingles(ws: ArrayData): GenericArrayData = {
    val m = ws.numElements()
    val seen = new java.util.LinkedHashSet[UTF8String]
    val window = new Array[UTF8String](n)
    var i = 0
    while (i + n <= m) {
      var j = 0
      while (j < n) {
        window(j) =
          if (ws.isNullAt(i + j)) null else ws.getUTF8String(i + j)
        j += 1
      }
      seen.add(UTF8String.concatWs(space, window: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  override def nullSafeEval(input: Any): Any =
    buildShingles(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingler", this, classOf[WordShingles].getName)
    nullSafeCodeGen(ctx, ev, ws => s"${ev.value} = $ref.buildShingles($ws);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): WordShingles = copy(child = newChild)
}
