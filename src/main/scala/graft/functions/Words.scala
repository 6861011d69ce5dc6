package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native whitespace tokenization: text → `array<string>` of the
  * non-empty single-space-separated tokens — the exact semantics of
  * `filter(split(text, " "), w => w =!= "")`, which is the first step of
  * every text operator in the library (shingling, language ID, quality,
  * token counts, census).
  *
  * The column form pays twice per row: `split` materializes every empty
  * run between consecutive spaces, then the interpreted `ArrayFilter`
  * lambda walks the result outside whole-stage codegen. One fused byte
  * scan here: 0x20 cannot occur inside a UTF-8 multibyte sequence, so
  * token boundaries are found on raw bytes and each token is sliced
  * straight into a UTF8String — no regex, no empty-run garbage, no
  * interpreted lambda.
  *
  * Parity contract (pinned by WordsSpec): null text → null; empty text →
  * empty array; runs of spaces collapse; tabs/newlines are NOT
  * separators (the replaced form split on the literal single space). */
case class WordsSplit(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${dt.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_words"

  def splitWords(s: UTF8String): GenericArrayData = {
    val b = s.getBytes
    val out = new java.util.ArrayList[AnyRef]
    var start = 0
    var i = 0
    while (i <= b.length) {
      if (i == b.length || b(i) == ' ') {
        if (i > start) out.add(UTF8String.fromBytes(b, start, i - start))
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(input: Any): Any =
    splitWords(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("splitter", this, classOf[WordsSplit].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ref.splitWords($t);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): WordsSplit = copy(child = newChild)
}

/** Native language-ID scoring: words → `array<int>` of per-language
  * stopword OCCURRENCE counts plus, as the last element, the
  * any-language count — one hash-probe pass over the token list where
  * the column form ran one interpreted `ArrayFilter` + `isin` scan per
  * language and another for the union set (6 interpreted walks per row
  * on the curation hot path).
  *
  * Occurrence (not distinct-word) counting, and an independent union
  * count, exactly match the replaced folds: the per-language stopword
  * sets overlap ("de" is Spanish, French, and Chinese-pinyin; "le" is
  * French and Chinese), so the union count is NOT the sum of the
  * per-language counts. */
case class LangScores(child: Expression) extends UnaryExpression {
  import LangScores._

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${dt.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_lang_scores"

  def score(ws: ArrayData): GenericArrayData = {
    val counts = new Array[Int](NumLangs + 1)
    val m = ws.numElements()
    var i = 0
    while (i < m) {
      if (!ws.isNullAt(i)) {
        val mask = Mask.getOrDefault(ws.getUTF8String(i), 0)
        if (mask != 0) {
          var l = 0
          while (l < NumLangs) {
            if (((mask >> l) & 1) == 1) counts(l) += 1
            l += 1
          }
          counts(NumLangs) += 1
        }
      }
      i += 1
    }
    val boxed = new Array[AnyRef](counts.length)
    var j = 0
    while (j < counts.length) {
      boxed(j) = java.lang.Integer.valueOf(counts(j))
      j += 1
    }
    new GenericArrayData(boxed)
  }

  override def nullSafeEval(input: Any): Any =
    score(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("scorer", this, classOf[LangScores].getName)
    nullSafeCodeGen(ctx, ev, ws => s"${ev.value} = $ref.score($ws);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): LangScores = copy(child = newChild)
}

object LangScores {
  /** The canonical per-language stopword table (n-gram-heuristic language
    * ID). Declaration order is the tie-break priority order; moved here
    * from TextAnalysis (which re-exports it) so the expression and the
    * operator share one source of truth. */
  val StopWords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "mit", "ist", "ein"),
    "es" -> Seq("el", "la", "de", "y", "que", "los", "una"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "une"),
    "zh" -> Seq("de", "le", "shi", "bu", "wo", "zai", "you"))

  val NumLangs: Int = StopWords.size

  /** word → bitmask of the languages whose stop list contains it. */
  private val Mask: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer]
    StopWords.zipWithIndex.foreach { case ((_, stop), i) =>
      stop.foreach { w =>
        val k = UTF8String.fromString(w)
        m.put(k, Integer.valueOf(m.getOrDefault(k, 0) | (1 << i)))
      }
    }
    m
  }
}
