package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Bloom-membership probe: `graft_bloom_hit(gram, sketchBytes)`
  * tests a long against a serialized [[BloomFilter]] sketch.
  *
  * This replaces a Scala UDF on the decontamination prefilter's hot path
  * (one probe per corpus gram — at 100 TB, trillions of calls): the UDF
  * pays a box + invoke per gram and fences whole-stage codegen around
  * the filter, where this expression splices a direct
  * `mightContainLong` call into the generated code. The same pattern as
  * Spark's own runtime-filter `BloomFilterMightContain` (public Spark
  * source, sql/catalyst): deserialize the foldable sketch once
  * driver-side, ship the filter object via the codegen references array
  * (part of the per-stage task binary — broadcast once, not per task).
  *
  * The sketch argument must be a foldable binary literal — the caller
  * builds the sketch from the (benchmark-sized) eval side and splices
  * its bytes; a non-foldable sketch would mean deserializing per row.
  */
case class BloomHit(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a bigint probe value, got " +
          left.dataType.simpleString)
    else if (right.dataType != BinaryType || !right.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable binary sketch, got " +
          s"${right.dataType.simpleString} (foldable=${right.foldable})")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = left.nullable
  override def prettyName: String = "graft_bloom_hit"

  // deserialized once per expression instance (driver at codegen time,
  // or per task in interpreted eval) — never per row
  @transient private lazy val filter: BloomFilter = {
    val bytes = right.eval().asInstanceOf[Array[Byte]]
    require(bytes != null, s"$prettyName: sketch bytes must not be null")
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  override def nullSafeEval(g: Any, unused: Any): Any =
    filter.mightContainLong(g.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", filter,
      classOf[BloomFilter].getName)
    val leftGen = left.genCode(ctx)
    ev.copy(code = code"""
      ${leftGen.code}
      boolean ${ev.isNull} = ${leftGen.isNull};
      boolean ${ev.value} = false;
      if (!${ev.isNull}) {
        ${ev.value} = $ref.mightContainLong(${leftGen.value});
      }""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomHit =
    copy(left = newLeft, right = newRight)
}
