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

  test("adversarial identifiers: keywords-as-names, dotted+backticked " +
      "mixes, empty parts (r12)") {
    // SQL keywords are legal identifier parts — the splitter must not
    // treat them specially
    assert(GraftDml.splitIdentifier("select.from.where") ==
      Seq("select", "from", "where"))
    assert(GraftDml.splitIdentifier("`vacuum`.`optimize`") ==
      Seq("vacuum", "optimize"))
    // backticked keyword with an embedded dot AND escaped backtick
    assert(GraftDml.splitIdentifier("cat.`drop``table.v2`") ==
      Seq("cat", "drop`table.v2"))
    // consecutive dots produce empty parts (resolution rejects them
    // downstream; the splitter must not silently collapse)
    assert(GraftDml.splitIdentifier("a..b") == Seq("a", "", "b"))
    // leading/trailing backticked segments
    assert(GraftDml.splitIdentifier("`a.b`.`c.d`") ==
      Seq("a.b", "c.d"))
    // a lone backticked dot
    assert(GraftDml.splitIdentifier("`.`") == Seq("."))
  }

  test("verb parser recognizes statements case-insensitively and " +
      "rejects malformed MV select lists with the contract (r12)") {
    import GraftVerbs._
    assert(parse("vacuum t retain 24 hours") ==
      Some(Vacuum("t", Some(24L))))
    assert(parse("VACUUM `my.table`") == Some(Vacuum("`my.table`", None)))
    assert(parse("show changes g.ns.t from 3 to 9") ==
      Some(ShowChanges("g.ns.t", 3L, Some(9L))))
    assert(parse("EXPIRE HISTORY h BEFORE -2") ==
      Some(ExpireHistory("h", Right(-2L))))
    assert(parse("SELECT * FROM t") == None) // not ours
    assert(parse(
      """CREATE MATERIALIZED VIEW v AS
        SELECT grp, count(*) AS cnt, sum(price) AS total
        FROM base GROUP BY grp""") ==
      Some(CreateMv("v", Seq("grp"), "price", "base")))
    // a recognized verb with a bad select list fails AT PARSE with
    // the contract, never half-parses
    val e = intercept[Exception] {
      parse("""CREATE MATERIALIZED VIEW bad AS
        SELECT grp, avg(price) AS a FROM base GROUP BY grp""")
    }
    assert(e.getMessage.contains("count(*) AS cnt"), e.getMessage)
  }
}
