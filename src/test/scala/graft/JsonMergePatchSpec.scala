package graft

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
}
