package graft

import graft.ops.SchemaUnion
import org.scalatest.funsuite.AnyFunSuite

/** Schema-widening unit vectors from the reference
  * (`src/geoq/fgb/header.rs:182-208`). */
class SchemaUnionSpec extends AnyFunSuite {

  test("basic inference: {name: String, age: Long}") {
    val t = SchemaUnion.typesOf("""{"name":"Alice","age":30}""")
    assert(t == Map("name" -> "string", "age" -> "long"))
  }

  test("long widens to double on conflict") {
    val a = SchemaUnion.typesOf("""{"x":1}""")
    val b = SchemaUnion.typesOf("""{"x":1.5}""")
    assert(SchemaUnion.mergeMaps(a, b) == Map("x" -> "double"))
    assert(SchemaUnion.mergeMaps(b, a) == Map("x" -> "double"))
  }

  test("mixed conflicts widen to json") {
    val a = SchemaUnion.typesOf("""{"x":"str"}""")
    val b = SchemaUnion.typesOf("""{"x":1}""")
    assert(SchemaUnion.mergeMaps(a, b) == Map("x" -> "json"))
    val c = SchemaUnion.typesOf("""{"x":true}""")
    assert(SchemaUnion.mergeMaps(a, c) == Map("x" -> "json"))
  }

  test("nulls are skipped; arrays/objects are json") {
    val t = SchemaUnion.typesOf("""{"a":null,"b":[1,2],"c":{"d":1}}""")
    assert(t == Map("b" -> "json", "c" -> "json"))
  }

  test("first-seen type wins when equal; merge is commutative on the lattice") {
    val rows = Seq("""{"k":1}""", """{"k":2}""", """{"k":3.5}""", """{"j":"s"}""")
    val merged = rows.map(SchemaUnion.typesOf).reduce(SchemaUnion.mergeMaps)
    assert(merged == Map("k" -> "double", "j" -> "string"))
    val mergedRev = rows.reverse.map(SchemaUnion.typesOf).reduce(SchemaUnion.mergeMaps)
    assert(mergedRev == merged)
  }
}
