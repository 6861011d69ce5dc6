package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.llm.TextHash

/** Native hashed-TF featurizer: `array<string>` words → the `dim`-length
  * signed-count vector (Weinberger et al. hashing trick) in ONE per-row
  * pass — the fused form of [[graft.llm.Features.hashedTfVectors]]'s
  * explode → (doc, bucket) aggregation → per-doc map assembly → dense
  * transform, which paid two shuffles, an ObjectHashAggregate map build,
  * and O(dim) `element_at` linear scans per output slot to compute a
  * value that is a pure function of the document's own words.
  *
  * Arithmetic is [[TextHash.h32p]]'s verbatim: bucket = h32p(w) mod dim,
  * sign from h32p("sgn:" ++ w) parity — digests computed over the UTF-8
  * bytes directly ([[HashedShingles]]'s no-hex-round-trip argument), and
  * the per-bucket sum is LONG addition (order-free, so fusing the
  * shuffle away cannot change a single bit). The DuckDB oracle twins
  * ([[graft.llm.Features.sqlHashedTfCtes]]) replay the same group-by
  * form unchanged.
  *
  * Null contract: null array → null (callers using the explode form got
  * a zero vector for a docless id via the ids LEFT join — the column
  * caller coalesces); null ELEMENTS are skipped — in the explode form a
  * null word hashed to a null bucket, which no output slot ever read.
  * Empty array → the zero vector, exactly the no-word-rows outcome.
  */
case class HashedTf(child: Expression, dim: Int) extends UnaryExpression {
  require(dim >= 2 && dim <= 4096, s"dim=$dim must be in [2, 4096]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${dt.simpleString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_hashed_tf"

  override def nullSafeEval(input: Any): Any = {
    val ws = input.asInstanceOf[ArrayData]
    val n = ws.numElements()
    val acc = new Array[Long](dim)
    val md = HashedShingles.localDigest()
    var i = 0
    while (i < n) {
      if (!ws.isNullAt(i)) {
        val w = ws.getUTF8String(i)
        val b = (HashedShingles.h32(md, w) % dim).toInt
        md.update(HashedTf.SgnPrefix)
        md.update(w.getBytes)
        val s = if (TextHash.h32pBytes(md.digest()) % 2 == 0) 1L else -1L
        acc(b) += s
      }
      i += 1
    }
    val out = new Array[Double](dim)
    var j = 0
    while (j < dim) { out(j) = acc(j).toDouble; j += 1 }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mdClass = "java.security.MessageDigest"
    val md = ctx.addMutableState(mdClass, "graftMd5Tf", v =>
      s"""try { $v = $mdClass.getInstance("MD5"); }
         |catch (java.security.NoSuchAlgorithmException e) {
         |  throw new RuntimeException(e);
         |}""".stripMargin)
    val sgnRef = ctx.addReferenceObj("sgnPrefix", HashedTf.SgnPrefix, "byte[]")
    nullSafeCodeGen(ctx, ev, ws => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val hv = ctx.freshName("hv")
      val b = ctx.freshName("b")
      val wb = ctx.freshName("wb")
      val acc = ctx.freshName("acc")
      val out = ctx.freshName("out")
      val p = TextHash.P
      s"""
         |int $n = $ws.numElements();
         |long[] $acc = new long[$dim];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$ws.isNullAt($i)) {
         |    byte[] $wb = $ws.getUTF8String($i).getBytes();
         |    byte[] $d = $md.digest($wb);
         |    long $hv = ($d[0] & 0xffL) << 24;
         |    $hv |= ($d[1] & 0xffL) << 16;
         |    $hv |= ($d[2] & 0xffL) << 8;
         |    $hv |= $d[3] & 0xffL;
         |    int $b = (int) (($hv % ${p}L) % $dim);
         |    $md.update($sgnRef);
         |    $md.update($wb);
         |    $d = $md.digest();
         |    $hv = ($d[0] & 0xffL) << 24;
         |    $hv |= ($d[1] & 0xffL) << 16;
         |    $hv |= ($d[2] & 0xffL) << 8;
         |    $hv |= $d[3] & 0xffL;
         |    $acc[$b] += (($hv % ${p}L) % 2L == 0L) ? 1L : -1L;
         |  }
         |}
         |double[] $out = new double[$dim];
         |for (int $j = 0; $j < $dim; $j++) $out[$j] = (double) $acc[$j];
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HashedTf =
    copy(child = newChild)
}

object HashedTf {
  /** UTF-8 bytes of the sign-hash namespace prefix — `concat('sgn:', w)`
    * in the column/SQL twins; UTF-8 string concat is byte concat, so
    * digesting prefix bytes then word bytes is the identical digest. */
  val SgnPrefix: Array[Byte] =
    UTF8String.fromString("sgn:").getBytes
}
