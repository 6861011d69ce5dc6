package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native left-fold dot product over two `array<double>` columns.
  *
  * This is the engine's one custom Catalyst expression: a tight numeric
  * loop evaluated O(pairs·dim) times inside similarity search, where the
  * preference order of the build (builtin > native Expression > UDF)
  * bottoms out — the builtin form (`aggregate(zip_with(...))`) is an
  * interpreted higher-order function, and a Scala UDF pays
  * serialization/boxing at every call. `doGenCode` splices a primitive
  * `while` loop over the unsafe array data straight into whole-stage
  * codegen: no allocation, no boxing, no virtual calls.
  *
  * The accumulation order is the same left-to-right fold as the DuckDB
  * oracle's `list_sum(list_transform(...))`, so cosines stay
  * bit-identical across engines (floating-point addition is not
  * associative — order is part of the contract).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  // null on LENGTH MISMATCH and on NULL ELEMENTS too (a truncated or
  // partially-encoded embedding must not produce a plausible partial dot
  // product that top-k then ranks on silently — and ArrayData.getDouble
  // on a null slot reads unspecified garbage) — the same observable
  // behavior as the builtin aggregate(zip_with(...)) form this expression
  // replaces, whose null padding/elements null the sum
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var acc = 0.0d
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        acc += x.getDouble(i) * y.getDouble(i)
        i += 1
      }
      acc
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $x.getDouble($i) * $y.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Registration for the engine's native functions. Uses the session's
  * function registry directly (idempotent, safe on sessions the library
  * did not build — the same surface `SparkSessionExtensions.injectFunction`
  * feeds at session build time). */
object GraftFunctions {
  val DotName = "graft_dot"
  val MinhashName = "graft_minhash"
  val SimhashName = "graft_simhash"
  val HashedShinglesName = "graft_hashed_shingles"
  val ShinglesName = "graft_shingles"
  val WordsName = "graft_words"
  val LangScoresName = "graft_lang_scores"
  val PosFpName = "graft_pos_fp"
  val BloomHitName = "graft_bloom_hit"
  val PlaneProjName = "graft_plane_project"
  val PlaneBitsName = "graft_plane_bits"
  val PlaneKeysName = "graft_plane_keys"
  val HashedTfName = "graft_hashed_tf"
  val UnigramViterbiName = "graft_unigram_viterbi"

  private def arity1(name: String, clazz: Class[_],
                     mk: Expression => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name),
      (children: Seq[Expression]) => {
        // a real arity error, not a silently-dropped extra argument or a
        // raw IndexOutOfBoundsException
        require(children.size == 1,
          s"$name expects exactly 1 argument, got ${children.size}")
        mk(children.head)
      })

  /** (identifier, info, builder) for every native function — the single
    * list BOTH registration paths feed from: [[register]] patches an
    * already-built session's registry, [[graft.GraftExtensions]] hands
    * the same tuples to `SparkSessionExtensions.injectFunction` at
    * session build time. */
  val builders: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier(DotName),
      new ExpressionInfo(classOf[DotProduct].getName, DotName),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"$DotName expects exactly 2 arguments, got ${children.size}")
        DotProduct(children(0), children(1))
      }),
    arity1(MinhashName, classOf[MinhashSig], MinhashSig(_)),
    arity1(SimhashName, classOf[SimhashFp], SimhashFp(_)),
    arity1(HashedShinglesName, classOf[HashedShingles], HashedShingles(_)),
    (FunctionIdentifier(ShinglesName),
      new ExpressionInfo(classOf[WordShingles].getName, ShinglesName),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"$ShinglesName expects exactly 2 arguments, got ${children.size}")
        require(children(1).foldable,
          s"$ShinglesName: shingle size must be a literal")
        val n = children(1).eval()
        require(n != null, s"$ShinglesName: shingle size must not be null")
        WordShingles(children(0), n.asInstanceOf[Number].intValue())
      }),
    arity1(WordsName, classOf[WordsSplit], WordsSplit(_)),
    arity1(LangScoresName, classOf[LangScores], LangScores(_)),
    arity1(PosFpName, classOf[PosWeightedFp], PosWeightedFp(_)),
    (FunctionIdentifier(BloomHitName),
      new ExpressionInfo(classOf[BloomHit].getName, BloomHitName),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"$BloomHitName expects exactly 2 arguments, got ${children.size}")
        BloomHit(children(0), children(1))
      }),
    planeBuilder(PlaneProjName, "proj", withBands = false),
    planeBuilder(PlaneBitsName, "bits", withBands = false),
    planeBuilder(PlaneKeysName, "keys", withBands = true),
    (FunctionIdentifier(HashedTfName),
      new ExpressionInfo(classOf[HashedTf].getName, HashedTfName),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          s"$HashedTfName expects exactly 2 arguments, got ${children.size}")
        require(children(1).foldable,
          s"$HashedTfName: dim must be a literal")
        val d = children(1).eval()
        require(d != null, s"$HashedTfName: dim must not be null")
        HashedTf(children.head, d.asInstanceOf[Number].intValue())
      }),
    (FunctionIdentifier(UnigramViterbiName),
      new ExpressionInfo(classOf[UnigramViterbi].getName, UnigramViterbiName),
      (children: Seq[Expression]) => {
        // (word, pieces, costs, maxPieceLen, maxWordLen) — everything
        // after the word a required literal: the vocabulary becomes a
        // hash-map reference object at plan construction, so it cannot
        // be data-dependent (the BPE merge-table argument)
        require(children.size == 5,
          s"$UnigramViterbiName expects exactly 5 arguments, got ${
            children.size}")
        def lit(i: Int): Any = {
          require(children(i).foldable,
            s"$UnigramViterbiName: argument $i must be a literal")
          val v = children(i).eval()
          require(v != null,
            s"$UnigramViterbiName: argument $i must not be null")
          v
        }
        val ps = lit(1).asInstanceOf[
          org.apache.spark.sql.catalyst.util.ArrayData]
        val cs = lit(2).asInstanceOf[
          org.apache.spark.sql.catalyst.util.ArrayData]
        UnigramViterbi(children.head,
          ps.toArray[org.apache.spark.unsafe.types.UTF8String](
            org.apache.spark.sql.types.StringType).map(_.toString).toIndexedSeq,
          cs.toLongArray().toIndexedSeq,
          lit(3).asInstanceOf[Number].intValue(),
          lit(4).asInstanceOf[Number].intValue())
      }))

  /** (vec, ns, rows, dim[, bands]) with everything after the vector a
    * required literal — the [[SignPlanes]] matrix is built at plan
    * construction, so the parameters cannot be data-dependent. */
  private def planeBuilder(name: String, mode: String, withBands: Boolean)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(classOf[SignPlanes].getName, name),
      (children: Seq[Expression]) => {
        val arity = if (withBands) 5 else 4
        require(children.size == arity,
          s"$name expects exactly $arity arguments, got ${children.size}")
        def lit(i: Int): Any = {
          require(children(i).foldable, s"$name: argument $i must be a literal")
          val v = children(i).eval()
          require(v != null, s"$name: argument $i must not be null")
          v
        }
        SignPlanes(children.head, lit(1).toString,
          lit(2).asInstanceOf[Number].intValue(),
          lit(3).asInstanceOf[Number].intValue(),
          if (withBands) lit(4).asInstanceOf[Number].intValue() else 1,
          mode)
      })

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    builders.foreach { case (ident, info, builder) =>
      if (!registry.functionExists(ident)) {
        registry.registerFunction(ident, info, builder)
      }
    }
  }
}
