package graft.codec

import org.json4s._
import org.json4s.jackson.JsonMethods

/** RFC-7386 JSON merge patch computation — the diff the reference appends
  * to a doc's `json-merge-patches` array on every update
  * (`addPatch` → jsonpatch.CreateMergePatch, monstache.go:3084-3158).
  *
  * Patch(old → new): keys changed or added carry the new value, keys
  * removed carry null, equal keys are omitted; object-vs-object recurses,
  * anything else is replaced wholesale. Output is rendered compact with
  * keys sorted at every level so the result is a deterministic canonical
  * string (hash-comparable against an oracle that constructs the same
  * patch textually).
  *
  * Used as a scalar UDF: JSON diffing over dynamic shapes is genuinely
  * row-local scalar work the reference also does per-op; the surrounding
  * pairing (lag over (id, version)) stays set-oriented column algebra, so
  * the UDF sits on an already-minimal projection.
  */
object JsonMergePatch {

  def diffAst(oldV: JValue, newV: JValue): JValue = (oldV, newV) match {
    case (JObject(of), JObject(nf)) =>
      val om = of.toMap
      val nm = nf.toMap
      val removed = om.keysIterator.filterNot(nm.contains).map(k => k -> JNull)
      val changed = nf.iterator.collect {
        case (k, nv) if !om.get(k).contains(nv) =>
          (om.get(k), nv) match {
            case (Some(ov: JObject), nvo: JObject) => k -> diffAst(ov, nvo)
            case _ => k -> nv
          }
      }
      JObject((changed ++ removed).toList.sortBy(_._1))
    case (_, n) => n
  }

  private def canonical(v: JValue): JValue = v match {
    case JObject(fs) => JObject(fs.map { case (k, x) => k -> canonical(x) }.sortBy(_._1))
    case JArray(xs) => JArray(xs.map(canonical))
    case other => other
  }

  /** Merge patch old→new as a canonical compact JSON string. A null
    * `oldJson` means "no previous document": the patch is the canonical
    * full doc — the v1 convention every patch-log producer shares
    * (monstache.go:3138-3150), centralized here so call sites stop
    * re-implementing the null branch around `JsonMethods.parse(null)`. */
  def diff(oldJson: String, newJson: String): String =
    if (oldJson == null) canonicalJson(newJson)
    else JsonMethods.compact(JsonMethods.render(
      diffAst(JsonMethods.parse(oldJson), JsonMethods.parse(newJson))))

  /** A document rendered in the same canonical form (for insert rows,
    * where patch v1 is the full doc, monstache.go:3138-3150). Null in,
    * null out — delete ops carry no document. */
  def canonicalJson(json: String): String =
    if (json == null) null
    else JsonMethods.compact(JsonMethods.render(canonical(JsonMethods.parse(json))))

  /** RFC-7386 §2 application — the consumer side of the patch log (how a
    * reader reconstructs document history from the appended patches): an
    * object patch merges member-wise (null deletes the key, any other
    * value applies recursively against the existing member or `{}`); a
    * non-object patch replaces the target wholesale.
    *
    * Inverse law: `apply(a, diff(a, b)) == b` for documents without
    * explicit null values — merge patch cannot *set* null, the format's
    * documented lossiness (RFC 7386 §1), shared by the reference's
    * jsonpatch.CreateMergePatch. */
  def applyAst(target: JValue, patch: JValue): JValue = patch match {
    case JObject(pf) =>
      val base = target match { case JObject(tf) => tf; case _ => Nil }
      val tm = scala.collection.mutable.LinkedHashMap(base: _*)
      pf.foreach {
        case (k, JNull) => tm.remove(k)
        case (k, pv) => tm.update(k, applyAst(tm.getOrElse(k, JNothing), pv))
      }
      JObject(tm.toList)
    case other => other
  }

  /** Apply a merge patch to a document; canonical compact output. */
  def applyPatch(oldJson: String, patch: String): String =
    JsonMethods.compact(JsonMethods.render(canonical(
      applyAst(JsonMethods.parse(oldJson), JsonMethods.parse(patch)))))
}
