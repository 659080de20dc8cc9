package graft.lake.sql

import org.scalatest.funsuite.AnyFunSuite

/** Pure text-level checks of the element-assignment lowering — the
  * certainty gates (only rewrite what is provably an element SET key)
  * matter as much as the positive cases. */
class ElementRewriteSpec extends AnyFunSuite {

  test("simple array assignment lowers onto lake_element_set") {
    val got = ElementAssignmentRewrite.rewrite(
      "UPDATE c.ns.e SET tags[1] = 'X' WHERE id <= 2")
    // EXACT equality — a contains() check once let an auto-tupled
    // StringBuilder.append garble the surrounding text unnoticed
    assert(got.contains("UPDATE c.ns.e SET tags = " +
      "lake_element_set(tags, 1, ('X'), true) WHERE id <= 2"), got)
  }

  test("map key and deep paths compose; WHERE comparisons untouched") {
    val got = ElementAssignmentRewrite.rewrite(
      "UPDATE t SET m['k'] = m['k'] + 1, recs[0].w = 'W' WHERE tags[1] = 'y'")
    assert(got.isDefined)
    val s = got.get
    assert(s.contains("m = lake_element_set(m, 'k', (m['k'] + 1), true)"), s)
    assert(s.contains(
      "recs = lake_element_set(recs, 0, lake_field_set((recs)[0], 'w', ('W')), false)"), s)
    assert(s.contains("WHERE tags[1] = 'y'"), s)
  }

  test("MERGE clause regions end at WHEN; CASE WHEN in a value does not") {
    val got = ElementAssignmentRewrite.rewrite(
      "MERGE INTO t USING s ON t.id = s.id " +
        "WHEN MATCHED THEN UPDATE SET t.tags[0] = CASE WHEN s.x > 0 THEN 'a' ELSE 'b' END " +
        "WHEN NOT MATCHED THEN INSERT (id) VALUES (s.id)")
    assert(got.isDefined)
    val s = got.get
    assert(s.contains("t.tags = lake_element_set(t.tags, 0, " +
      "(CASE WHEN s.x > 0 THEN 'a' ELSE 'b' END), true)"), s)
    assert(s.contains("WHEN NOT MATCHED THEN INSERT"), s)
  }

  test("certainty gates: non-literal index, no brackets, bracket in string") {
    assert(ElementAssignmentRewrite.rewrite(
      "UPDATE t SET tags[id] = 'X'").isEmpty, "expression index must not lower")
    assert(ElementAssignmentRewrite.rewrite(
      "UPDATE t SET a = 1").isEmpty)
    assert(ElementAssignmentRewrite.rewrite(
      "UPDATE t SET a = '[1]'").isEmpty, "bracket inside a string literal")
  }
}
