package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.codec.JsonMergePatch

/** RFC-7386 semantics incl. the nested/array cases the flat-doc oracle
  * query can't reach (reference: jsonpatch.CreateMergePatch used at
  * monstache.go:3084-3158). */
class JsonMergePatchSpec extends AnyFunSuite {
  private def d(a: String, b: String) = JsonMergePatch.diff(a, b)

  test("changed and added keys carry the new value") {
    assert(d("""{"a":1,"b":2}""", """{"a":1,"b":3,"c":4}""") == """{"b":3,"c":4}""")
  }

  test("removed keys become null; equal docs give the empty patch") {
    assert(d("""{"a":1,"b":2}""", """{"a":1}""") == """{"b":null}""")
    assert(d("""{"a":1}""", """{"a":1}""") == "{}")
  }

  test("nested objects recurse; arrays and type changes replace wholesale") {
    assert(d("""{"o":{"x":1,"y":2},"k":0}""", """{"o":{"x":1,"y":3},"k":0}""") ==
      """{"o":{"y":3}}""")
    assert(d("""{"a":[1,2]}""", """{"a":[1,2,3]}""") == """{"a":[1,2,3]}""")
    assert(d("""{"a":{"x":1}}""", """{"a":5}""") == """{"a":5}""")
  }

  test("non-object new value replaces everything (RFC-7386 §2)") {
    assert(d("""{"a":1}""", """7""") == "7")
  }

  test("canonicalJson sorts keys recursively, compact") {
    assert(JsonMergePatch.canonicalJson("""{"b":1, "a": {"z":1, "y":2}}""") ==
      """{"a":{"y":2,"z":1},"b":1}""")
  }

  test("apply merges, deletes on null, recurses, replaces non-objects") {
    def ap(t: String, p: String) = JsonMergePatch.applyPatch(t, p)
    assert(ap("""{"a":1,"b":2}""", """{"b":null,"c":3}""") == """{"a":1,"c":3}""")
    assert(ap("""{"o":{"x":1,"y":2}}""", """{"o":{"y":3}}""") ==
      """{"o":{"x":1,"y":3}}""")
    assert(ap("""{"a":{"x":1}}""", """{"a":5}""") == """{"a":5}""")
    assert(ap("""{"a":1}""", """7""") == "7")
    // object patch against a non-object member merges into {} (RFC §2)
    assert(ap("""{"a":1}""", """{"a":{"x":2}}""") == """{"a":{"x":2}}""")
  }

  /** The inverse law over 300 generated document pairs: replaying the
    * patch log reconstructs every version. Null values are excluded from
    * the generator — merge patch cannot set null (RFC 7386 §1), the
    * format's documented lossiness. */
  test("property: apply(a, diff(a, b)) == b (null-free docs)") {
    val scalar: Gen[String] = Gen.oneOf(
      Gen.chooseNum(-1000, 1000).map(_.toString),
      Gen.alphaStr.map(s => "\"" + s.take(6) + "\""),
      Gen.oneOf("true", "false"),
      Gen.listOfN(3, Gen.chooseNum(0, 9)).map(_.mkString("[", ",", "]")))
    def obj(depth: Int): Gen[String] = for {
      n <- Gen.chooseNum(0, 5)
      keys <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d", "e", "f"))
      vals <- Gen.listOfN(n, if (depth <= 0) scalar
                             else Gen.frequency(3 -> scalar, 1 -> obj(depth - 1)))
    } yield keys.distinct.zip(vals)
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val pairs = Gen.listOfN(300, Gen.zip(obj(2), obj(2)))
      .apply(Gen.Parameters.default, Seed(7L)).get
    pairs.foreach { case (a, b) =>
      val rebuilt = JsonMergePatch.applyPatch(a, JsonMergePatch.diff(a, b))
      assert(rebuilt == JsonMergePatch.canonicalJson(b),
        s"roundtrip failed: a=$a b=$b patch=${JsonMergePatch.diff(a, b)}")
    }
  }
}
