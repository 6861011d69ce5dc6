package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.llm.TextHash

/** Native shingle-array hashing: `array<string>` → `array<long>`, each
  * element the first-4-MD5-bytes 32-bit prefix mod P — the per-document
  * hash feeding every LSH path (near-dedup signing, decontamination gram
  * tables, fingerprint minima).
  *
  * The builtin form (`transform(sh, s -> h32p(s))`) pays the
  * higher-order-function tax on the hottest array in the engine: HOF
  * lambdas are interpreted per element, and `h32p`'s column form routes
  * every hash through a 32-char hex string + `conv` base-10 parse. This
  * expression digests the UTF-8 bytes directly and assembles the 32-bit
  * prefix numerically — one `MessageDigest` per task (codegen mutable
  * state / thread-local in interpreted eval), no hex round-trip, no
  * per-element expression dispatch. Bit-identical to
  * [[TextHash.h32p]] / the oracle's [[TextHash.sqlH32p]]: parsing 8 hex
  * chars as an unsigned number IS the big-endian value of the first 4
  * digest bytes.
  *
  * Null contract matches the HOF it replaces: null array → null, null
  * element → null element (downstream [[MinhashSig]] then nulls the whole
  * signature, keeping partial-signature rows out of LSH buckets).
  */
case class HashedShingles(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${dt.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_hashed_shingles"

  override def nullSafeEval(input: Any): Any = {
    val sh = input.asInstanceOf[ArrayData]
    val n = sh.numElements()
    val out = new Array[Any](n)
    val md = HashedShingles.localDigest()
    var i = 0
    while (i < n) {
      if (!sh.isNullAt(i)) {
        out(i) = HashedShingles.h32(md, sh.getUTF8String(i))
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mdClass = "java.security.MessageDigest"
    val md = ctx.addMutableState(mdClass, "graftMd5", v =>
      s"""try { $v = $mdClass.getInstance("MD5"); }
         |catch (java.security.NoSuchAlgorithmException e) {
         |  throw new RuntimeException(e);
         |}""".stripMargin)
    nullSafeCodeGen(ctx, ev, sh => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val v = ctx.freshName("v")
      val out = ctx.freshName("out")
      // Janino: no autoboxing into Object[], and a leading parenthesized
      // or-chain after `=` mis-parses as a cast — hence the named long
      // accumulator and the explicit Long.valueOf.
      s"""
         |int $n = $sh.numElements();
         |Object[] $out = new Object[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$sh.isNullAt($i)) {
         |    byte[] $d = $md.digest($sh.getUTF8String($i).getBytes());
         |    long $v = ($d[0] & 0xffL) << 24;
         |    $v |= ($d[1] & 0xffL) << 16;
         |    $v |= ($d[2] & 0xffL) << 8;
         |    $v |= $d[3] & 0xffL;
         |    $out[$i] = java.lang.Long.valueOf($v % ${TextHash.P}L);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): HashedShingles = copy(child = newChild)
}

object HashedShingles {
  private val tl: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Thread-local digest for interpreted eval ([[Expression.eval]] can
    * run on any task thread; MessageDigest is stateful). `digest()`
    * resets the instance after each call, so reuse is safe. */
  def localDigest(): MessageDigest = tl.get()

  /** First-4-MD5-bytes unsigned 32-bit prefix mod P of a UTF-8 string —
    * [[TextHash.h32pBytes]] over the digest (the shared core, so the
    * bit-parity contract has one Scala definition). */
  def h32(md: MessageDigest, u: UTF8String): Long =
    TextHash.h32pBytes(md.digest(u.getBytes))
}
