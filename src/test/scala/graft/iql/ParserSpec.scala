package graft.iql

import org.scalatest.funsuite.AnyFunSuite
import Ast._

class ParserSpec extends AnyFunSuite {

  test("facts, batch insert, delete, drop") {
    val p = Parser.parseProgram(
      """+edge(1, 2)
        |+edge[(2,3),(3,4)]
        |-edge(1, 2)
        |-edge
        |""".stripMargin)
    assert(p.statements == Seq(
      InsertFacts("edge", Seq(Seq(1L, 2L))),
      InsertFacts("edge", Seq(Seq(2L, 3L), Seq(3L, 4L))),
      DeleteFacts("edge", Seq(Seq(1L, 2L))),
      DropRelation("edge")))
  }

  test("typed literals") {
    val p = Parser.parseProgram("""+t(1, -2.5, "hi there", true, false)""")
    assert(p.statements == Seq(InsertFacts("t",
      Seq(Seq(1L, -2.5, "hi there", true, false)))))
  }

  test("session and persistent rules") {
    val p = Parser.parseProgram(
      """path(X, Y) <- edge(X, Y)
        |+path2(X, Z) <- path(X, Y), edge(Y, Z)
        |""".stripMargin)
    val Seq(RuleDef(r1), RuleDef(r2)) = p.statements: @unchecked
    assert(!r1.persistent && r2.persistent)
    assert(r1.head == Atom("path", Seq(Var("X"), Var("Y"))))
    assert(r2.body == Seq(
      Pos(Atom("path", Seq(Var("X"), Var("Y")))),
      Pos(Atom("edge", Seq(Var("Y"), Var("Z"))))))
  }

  test("negation, comparisons, bindings, wildcard") {
    val p = Parser.parseProgram(
      "ok(X, D) <- a(X, _), !blocked(X), X < 10, D = X * 2 + 1")
    val Seq(RuleDef(r)) = p.statements: @unchecked
    assert(r.body(1) == Neg(Atom("blocked", Seq(Var("X")))))
    assert(r.body(2) == Cmp("<", Var("X"), Const(10L)))
    assert(r.body(3) == Cmp("=", Var("D"),
      Arith("+", Arith("*", Var("X"), Const(2L)), Const(1L))))
  }

  test("aggregates in head") {
    val p = Parser.parseProgram("+dept_total(Dept, sum<Sal>) <- emp(_, Dept, Sal)")
    val Seq(RuleDef(r)) = p.statements: @unchecked
    assert(r.head.args == Seq(Var("Dept"), Agg("sum", Var("Sal"))))
  }

  test("query shorthand with constants and limit") {
    val p = Parser.parseProgram("?reach(1, Y), limit(10, 2)")
    val Seq(q: Query) = p.statements: @unchecked
    assert(q.body == Seq(Pos(Atom("reach", Seq(Const(1L), Var("Y"))))))
    assert(q.limit.contains(10) && q.offset.contains(2))
  }

  test("full query form with builtin call") {
    val p = Parser.parseProgram("?- emp(N, S), len(N) > 3, S >= 100.0")
    val Seq(q: Query) = p.statements: @unchecked
    assert(q.body == Seq(
      Pos(Atom("emp", Seq(Var("N"), Var("S")))),
      Cmp(">", Func("len", Seq(Var("N"))), Const(3L)),
      Cmp(">=", Var("S"), Const(100.0))))
  }

  test("comments and separators") {
    val p = Parser.parseProgram(
      """# a comment
        |+a(1); +b(2). // trailing comment
        |""".stripMargin)
    assert(p.statements.length == 2)
  }
}
