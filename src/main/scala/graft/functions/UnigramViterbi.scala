package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Viterbi segmentation of one census word under a FIXED
  * integer micro-nat vocabulary — the fused form of
  * [[graft.llm.Unigram]]'s `dpCol` + `walkCol` column stack.
  *
  * Why this exists (round-17 optimization measurement): the previous
  * column form was an `expr()` megatree — an `aggregate` fold over
  * `sequence(1, length(w))` whose lambda probed the vocabulary with
  * `element_at(map_literal, substring(...))` per candidate split. Two
  * costs: the ~90-entry vocabulary rode the plan as a `map(...)`
  * LITERAL re-planned into every consumer (q226's train replay carried
  * a 240 KB analyzed plan), and Catalyst's `element_at` on a map is a
  * LINEAR key scan, so every DP cell paid O(|vocab|) comparisons. One
  * expression holds the vocabulary in a hash map reference object and
  * runs the whole DP + backwalk in one pass per row: O(len ·
  * maxPieceLen) with O(1) lookups, and nothing for the optimizer to
  * inline or duplicate.
  *
  * Bit-identical contract with the column form it replaces (and the
  * DuckDB oracle's recursive-CTE twin, [[graft.llm.Unigram.sqlSegCtes]],
  * which is untouched):
  *  - `best[i]` carries the combined encoding `score·32 + j` (j = the
  *    chosen split start) — min over candidates is min score THEN min
  *    j, ties preferring the longer final piece;
  *  - costs are non-negative micro-nats, so Java `/ 32` equals SQL
  *    `DIV 32` (floor) on every reachable value;
  *  - an unreachable position gets `Unreach·32` exactly as the column
  *    form's `coalesce(array_min(...), Unreach*32)`;
  *  - the backwalk runs at most `maxWordLen` steps (the column form's
  *    fixed `sequence(1, maxWordLen)` fold) and prepends pieces in
  *    document order;
  *  - indices count CODE POINTS (Spark's `length`/`substring`
  *    semantics on UTF8String), though every census word is `[a-z0-9]+`
  *    by construction upstream.
  *
  * Interpreted eval and codegen share [[segment]] verbatim, so the two
  * paths cannot diverge; UnigramViterbiSpec pins the expression against
  * the replaced column form on edge inputs.
  */
case class UnigramViterbi(child: Expression, pieces: IndexedSeq[String],
                          costs: IndexedSeq[Long], maxPieceLen: Int,
                          maxWordLen: Int) extends UnaryExpression {
  require(pieces.length == costs.length,
    s"${pieces.length} pieces vs ${costs.length} costs")
  require(maxPieceLen >= 1, s"maxPieceLen=$maxPieceLen")
  require(maxWordLen >= 1 && maxWordLen < 32,
    s"maxWordLen=$maxWordLen must be in [1, 32) — the combined DP " +
      "encoding packs the split index into 5 bits")

  // java.lang.Long values so an ABSENT key is a null reference, never a
  // silently-unboxed 0 cost
  @transient private lazy val vmap: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](pieces.length * 2)
    var i = 0
    while (i < pieces.length) {
      m.put(pieces(i), java.lang.Long.valueOf(costs(i)))
      i += 1
    }
    m
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${dt.simpleString}")
  }
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_unigram_viterbi"

  /** DP + backwalk, shared verbatim by nullSafeEval and codegen. */
  def segment(word: UTF8String): ArrayData = {
    val cps = word.toString.codePoints().toArray
    val len = cps.length
    val best = new Array[Long](len + 1)
    var i = 1
    while (i <= len) {
      var m = Long.MaxValue
      var j = math.max(i - maxPieceLen, 0)
      while (j < i) {
        val cost = vmap.get(new String(cps, j, i - j))
        if (cost ne null) {
          val cand = (best(j) / 32 + cost.longValue()) * 32 + j
          if (cand < m) m = cand
        }
        j += 1
      }
      best(i) = if (m == Long.MaxValue) graft.llm.Unigram.Unreach * 32 else m
      i += 1
    }
    val out = new java.util.ArrayDeque[UTF8String](len)
    var pos = len
    var steps = 0
    while (pos > 0 && steps < maxWordLen) {
      val j = (best(pos) % 32).toInt
      out.addFirst(UTF8String.fromString(new String(cps, j, pos - j)))
      pos = j
      steps += 1
    }
    new GenericArrayData(out.toArray())
  }

  override def nullSafeEval(input: Any): Any =
    segment(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("viterbi", this,
      classOf[UnigramViterbi].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.segment($v);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): UnigramViterbi = copy(child = newChild)
}
