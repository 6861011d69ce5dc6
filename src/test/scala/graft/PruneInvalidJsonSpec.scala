package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.codec.PruneInvalidJson.prune

/** Recursive invalid-JSON pruning (P7, fixPruneInvalidJSON
  * monstache.go:878-950): NaN/Inf at any depth, date year range, arrays,
  * and canonical output. */
class PruneInvalidJsonSpec extends AnyFunSuite {

  test("prunes quoted non-finite literals at any nesting depth") {
    assert(prune("""{"a":"NaN","b":1}""") == """{"b":1}""")
    assert(prune("""{"o":{"x":"Infinity","y":2},"k":0}""")
      == """{"k":0,"o":{"y":2}}""")
    assert(prune("""{"o":{"i":{"d":"-Infinity"}}}""") == """{"o":{"i":{}}}""")
  }

  test("prunes non-finite numerics when the parser admits the literals") {
    assert(prune("""{"a":NaN,"b":1.5}""") == """{"b":1.5}""")
  }

  test("prunes array elements and recurses into survivors") {
    assert(prune("""{"xs":["NaN",1,{"y":"Infinity"}]}""")
      == """{"xs":[1,{}]}""")
  }

  test("date strings outside year [0,9999] are pruned, valid ones kept") {
    assert(prune("""{"t":"2025-06-15T12:00:00.000Z"}""")
      == """{"t":"2025-06-15T12:00:00.000Z"}""")
    assert(prune("""{"t":"11476-01-01T00:00:00.000Z"}""") == "{}")
    assert(prune("""{"t":"-0001-01-01T00:00:00.000Z"}""") == "{}")
    // a plain string that merely starts with digits is not a date
    assert(prune("""{"t":"12345 reasons"}""") == """{"t":"12345 reasons"}""")
  }

  test("null document passes through (deletes carry no body)") {
    assert(prune(null) == null)
  }
}
