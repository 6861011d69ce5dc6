package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native 32-bit SimHash fingerprint over an `array<long>` of hashed
  * shingles: bit b is set when at least half the hashes have bit b set
  * (deterministic ≥ tie-break, matching [[graft.llm.Dedup.sqlSimhash]]).
  *
  * Same justification as [[MinhashSig]]: one in-place pass over the
  * unsafe array data with a 32-slot counter, replacing a compiled UDF
  * that deserialized the whole shingle array per row. The empty-input
  * fingerprint is all 32 bits set (every `2·0 ≥ 0` vote passes) — the
  * UDF's and the SQL twin's exact behavior, preserved bit for bit. A
  * NULL element nulls the whole fingerprint (no plausible partial
  * buckets). */
case class SimhashFp(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> input, got ${dt.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val counts = new Array[Int](32)
    var i = 0
    while (i < n) {
      if (hs.isNullAt(i)) return null
      val h = hs.getLong(i)
      var b = 0
      while (b < 32) {
        if (((h >> b) & 1L) == 1L) counts(b) += 1
        b += 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 32) {
      if (2 * counts(b) >= n) fp |= 1L << b
      b += 1
    }
    fp
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val counts = ctx.freshName("counts")
      val fp = ctx.freshName("fp")
      s"""
         |int $n = $hs.numElements();
         |int[] $counts = new int[32];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($hs.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  long $h = $hs.getLong($i);
         |  for (int $b = 0; $b < 32; $b++) {
         |    if ((($h >> $b) & 1L) == 1L) $counts[$b]++;
         |  }
         |}
         |if (!${ev.isNull}) {
         |  long $fp = 0L;
         |  for (int $b = 0; $b < 32; $b++) {
         |    if (2 * $counts[$b] >= $n) $fp |= 1L << $b;
         |  }
         |  ${ev.value} = $fp;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimhashFp =
    copy(child = newChild)
}
