package graft

import graft.api.Col._
import graft.sql._

/** Parser unit tests by AST equality — the analog of the reference's
  * plan-equality tests (reference: tests/test_parser.py). */
class SqlParserSpec extends SparkSpec {

  test("select list with alias and star") {
    val q = SqlParser.parse("SELECT *, a AS b, x + 1 FROM 't'")
    assert(q.select(0) == SelectItem(Star, star = true))
    assert(q.select(1) == SelectItem(Alias(ColRef("a"), "b"), star = false))
    assert(q.select(2) == SelectItem(BinOp("+", ColRef("x"), Lit(1L)), star = false))
    assert(q.from == TableRef("t", None))
  }

  test("operator precedence: OR < AND < NOT < cmp < add < mul (reference parser.py:33-56)") {
    val q = SqlParser.parse("SELECT a FROM 't' WHERE a = 1 OR b = 2 AND c < 3 + 4 * 5")
    val expected =
      BinOp("|",
        BinOp("==", ColRef("a"), Lit(1L)),
        BinOp("&",
          BinOp("==", ColRef("b"), Lit(2L)),
          BinOp("<", ColRef("c"),
            BinOp("+", Lit(3L), BinOp("*", Lit(4L), Lit(5L))))))
    assert(q.where.contains(expected))
  }

  test("BETWEEN desugars to two inclusive comparisons (reference test_parser.py:396-414)") {
    val q = SqlParser.parse("SELECT a FROM 't' WHERE a BETWEEN 1 AND 5")
    val expected = BinOp("&",
      BinOp("<=", Lit(1L), ColRef("a")),
      BinOp("<=", ColRef("a"), Lit(5L)))
    assert(q.where.contains(expected))
  }

  test("COUNT() desugars to count aliased 'count' (reference sql.py:462-464)") {
    val q = SqlParser.parse("SELECT COUNT() FROM 't' GROUP BY g")
    assert(q.select.head.expr == AggCol("count", Lit(1L), Some("count")))
  }

  test("join with aliases and dotted columns (reference test_parser.py:352-393)") {
    val q = SqlParser.parse(
      "SELECT u.name FROM 'users' u JOIN 'orders' o ON u.id = o.user_id")
    assert(q.from == TableRef("users", Some("u")))
    assert(q.joins.head.table == TableRef("orders", Some("o")))
    assert(q.joins.head.how == "inner")
    assert(q.joins.head.on == BinOp("==", ColRef("u.id"), ColRef("o.user_id")))
  }

  test("LEFT/SEMI/ANTI join types honored (SURVEY §7.1.1 divergence)") {
    assert(SqlParser.parse("SELECT a FROM 't' LEFT JOIN 's' ON a = b")
      .joins.head.how == "left_outer")
    assert(SqlParser.parse("SELECT a FROM 't' SEMI JOIN 's' ON a = b")
      .joins.head.how == "left_semi")
    assert(SqlParser.parse("SELECT a FROM 't' ANTI JOIN 's' ON a = b")
      .joins.head.how == "left_anti")
  }

  test("HAVING and GROUP BY parse") {
    val q = SqlParser.parse(
      "SELECT g, SUM(x) AS s FROM 't' GROUP BY g HAVING SUM(x) > 10")
    assert(q.groupBy == Seq(ColRef("g")))
    assert(q.having.contains(
      BinOp(">", AggCol("sum", ColRef("x"), None), Lit(10L))))
  }

  test("float literals extend the reference grammar (SURVEY §7.1.4)") {
    val q = SqlParser.parse("SELECT a FROM 't' WHERE a > 1.5")
    assert(q.where.contains(BinOp(">", ColRef("a"), Lit(1.5))))
  }

  test("floor division, modulo and unary minus parse at mul precedence") {
    val q = SqlParser.parse("SELECT a // 2 + b % 3, -c FROM 't'")
    assert(q.select(0).expr == BinOp("+",
      BinOp("//", ColRef("a"), Lit(2L)),
      BinOp("%", ColRef("b"), Lit(3L))))
    assert(q.select(1).expr == BinOp("-", Lit(0L), ColRef("c")))
  }

  test("parentheses override precedence") {
    val q = SqlParser.parse("SELECT (a + b) * c FROM 't'")
    assert(q.select.head.expr ==
      BinOp("*", BinOp("+", ColRef("a"), ColRef("b")), ColRef("c")))
  }

  test("COUNT(col) and COUNT(DISTINCT col) extensions") {
    val q = SqlParser.parse("SELECT COUNT(a), COUNT(DISTINCT b) FROM 't' GROUP BY g")
    assert(q.select(0).expr == AggCol("count_col", ColRef("a"), None))
    assert(q.select(1).expr == AggCol("count_distinct", ColRef("b"), None))
  }

  test("parse errors raise ParseError (reference parser.py:102-109)") {
    assertThrows[ParseError](SqlParser.parse("SELECT FROM 't'"))
    assertThrows[ParseError](SqlParser.parse("SELECT a 't'"))
    assertThrows[ParseError](SqlParser.parse("SELECT a FROM 't' WHERE a LIKE 5"))
  }

  test("NOT is implemented (reference declares-but-raises, sql.py:44-45)") {
    val q = SqlParser.parse("SELECT a FROM 't' WHERE NOT a = 1")
    assert(q.where.contains(Not(BinOp("==", ColRef("a"), Lit(1L)))))
  }
}
