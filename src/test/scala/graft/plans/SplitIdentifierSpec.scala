package graft.plans

import org.scalatest.funsuite.AnyFunSuite

/** Backtick-aware multipart-identifier splitting for the maintenance
  * SQL surface (VACUUM/OPTIMIZE/DESCRIBE HISTORY take raw names, not
  * parsed plans): a dot inside backticks is part of the identifier,
  * matching Spark's own quoting rule.
  */
class SplitIdentifierSpec extends AnyFunSuite {

  test("plain dotted name splits on every dot") {
    assert(GraftDml.splitIdentifier("graft.ns.t") ==
      Seq("graft", "ns", "t"))
    assert(GraftDml.splitIdentifier("t") == Seq("t"))
  }

  test("backticked part keeps its dots") {
    assert(GraftDml.splitIdentifier("`my.table`") == Seq("my.table"))
    assert(GraftDml.splitIdentifier("cat.`a.b`.t") ==
      Seq("cat", "a.b", "t"))
  }

  test("doubled backtick inside quotes unescapes") {
    assert(GraftDml.splitIdentifier("`we``ird`") == Seq("we`ird"))
  }

  test("mixed quoted and unquoted segments") {
    assert(GraftDml.splitIdentifier("`graft`.ns.`t.v1`") ==
      Seq("graft", "ns", "t.v1"))
  }
}
