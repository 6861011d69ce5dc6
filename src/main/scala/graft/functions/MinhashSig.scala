package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

import graft.llm.TextHash

/** Native K-element minhash signature over an `array<long>` of hashed
  * shingles — the hottest fold in the LSH dedup family (evaluated once
  * per document per dedup pass, K×|shingles| multiply-mod steps each).
  *
  * Same preference-order argument as [[DotProduct]]: the builtin form
  * (K × `array_min(transform(...))`) is interpreted AND walks the array
  * K times; the compiled UDF it replaces made one pass but paid
  * catalyst→Scala deserialization of the whole shingle array (plus boxing)
  * at every call. This expression reads the unsafe array data in place:
  * one pass, a K-slot primitive accumulator, no Ser/De.
  *
  * Arithmetic is unchanged — `(A(j)·h + B(j)) mod P` with the fixed
  * [[TextHash]] coefficients — so signatures stay bit-identical to the
  * DuckDB oracle's [[TextHash.sqlMinhashSig]]. Empty input degenerates to
  * K nulls (`array_min` of empty, the shape downstream band-keys expect);
  * a NULL element nulls the whole signature (a partially-hashed shingle
  * list must not produce a plausible partial signature that LSH then
  * buckets on).
  */
case class MinhashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> input, got ${dt.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_minhash"
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    if (n == 0) new GenericArrayData(new Array[Any](TextHash.K))
    else {
      val mins = Array.fill(TextHash.K)(Long.MaxValue)
      var i = 0
      while (i < n) {
        if (hs.isNullAt(i)) return null
        val h = hs.getLong(i)
        var j = 0
        while (j < TextHash.K) {
          val v = (TextHash.A(j) * h + TextHash.B(j)) % TextHash.P
          if (v < mins(j)) mins(j) = v
          j += 1
        }
        i += 1
      }
      new GenericArrayData(mins)
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", TextHash.A.toArray, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", TextHash.B.toArray, "long[]")
    nullSafeCodeGen(ctx, ev, hs => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val mins = ctx.freshName("mins")
      val k = TextHash.K
      val p = TextHash.P
      s"""
         |int $n = $hs.numElements();
         |if ($n == 0) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new Object[$k]);
         |} else {
         |  long[] $mins = new long[$k];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($hs.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    long $h = $hs.getLong($i);
         |    for (int $j = 0; $j < $k; $j++) {
         |      long $v = ($aRef[$j] * $h + $bRef[$j]) % ${p}L;
         |      if ($v < $mins[$j]) $mins[$j] = $v;
         |    }
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}
