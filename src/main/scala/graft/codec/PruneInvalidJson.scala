package graft.codec

import org.json4s._
import org.json4s.jackson.JsonMethods

/** P7, the recursive half: prune NaN/±Inf numbers and out-of-range dates
  * *inside* a document, not just at top level — `fixPruneInvalidJSON`
  * walks maps and slices removing float NaN/Inf and `time.Time` values
  * with year outside [0, 9999] (monstache.go:878-950; the opt-in
  * `prune-invalid-json` flag).
  *
  * In the engine's JSON-string document model the invalid values surface
  * two ways: as non-finite numerics (when a parser admits the literals)
  * and as the quoted `"NaN"`/`"Infinity"`/`"-Infinity"` strings Spark's
  * JSON writer emits for non-finite doubles. Dates are ISO-8601 strings,
  * so the year test reads the leading year field. Both are pruned, at any
  * nesting depth, in objects and arrays alike.
  *
  * Known modeling trade: once a document is a JSON string, a GENUINE
  * string field that happens to equal `"NaN"` (or to look like an
  * out-of-range ISO date) is indistinguishable from a writer-emitted
  * non-finite marker and is pruned with it. The reference sees typed
  * BSON and does not have this ambiguity; the opt-in flag is the
  * user's acknowledgment of the string-model cost.
  *
  * Scalar UDF by design, like [[JsonMergePatch]]: recursive work over
  * dynamic shapes is row-local; the surrounding plan stays column
  * algebra. Output is canonical (sorted keys, compact) so it is
  * hash-comparable against an oracle that constructs the same document
  * textually.
  */
object PruneInvalidJson {

  /** Lenient parser: admits the bare NaN/Infinity literals (the BSON
    * side of the reference can hold them; strict JSON cannot). */
  private val lenientMapper = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m.configure(
      com.fasterxml.jackson.core.JsonParser.Feature.ALLOW_NON_NUMERIC_NUMBERS,
      true)
    m
  }

  private val IsoDate = "^([+-]?)(\\d{1,6})-\\d{2}-\\d{2}T.*".r

  private def invalidString(s: String): Boolean = s match {
    case "NaN" | "Infinity" | "-Infinity" => true
    case IsoDate(sign, year) => sign == "-" || year.toInt > 9999
    case _ => false
  }

  private def invalid(v: JValue): Boolean = v match {
    case JDouble(d) => d.isNaN || d.isInfinite
    case JString(s) => invalidString(s)
    case _ => false
  }

  def pruneAst(v: JValue): JValue = v match {
    case JObject(fields) =>
      JObject(fields.collect {
        case (k, x) if !invalid(x) => k -> pruneAst(x)
      }.sortBy(_._1))
    case JArray(xs) => JArray(xs.filterNot(invalid).map(pruneAst))
    case other => other
  }

  /** Lenient document parse (admits NaN/Infinity literals) — shared with
    * [[graft.operators.FileContent.foldIntoDocument]], which must not be
    * stricter about a document than the prune that may run after it. */
  private[graft] def parseLenient(json: String): JValue =
    JsonMethods.fromJsonNode(lenientMapper.readTree(json))

  /** Prune a JSON document string; null passes through (deletes carry no
    * document). */
  def prune(json: String): String =
    if (json == null) null
    else JsonMethods.compact(JsonMethods.render(pruneAst(parseLenient(json))))

  /** Column form of [[prune]] — the one definition both q49 and the
    * config front door (`prune-invalid-json`) apply. A justified UDF:
    * the walk is row-local recursive JSON with no column-algebra form. */
  def pruneCol(doc: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.udf((s: String) => prune(s)).apply(doc)
}
