package graft.iql

/** AST for the IQL Datalog dialect (reference: `src/ast/mod.rs` — Rule
  * `:1047-1050`, BodyPredicate `:959-982`, Term `:729-760`, aggregates
  * `:22-56`). Semantics, not syntax-tree structure, are mirrored; this
  * is an independent Scala design.
  */
object Ast {

  sealed trait Term
  final case class Var(name: String) extends Term
  /** Constant: Long, Double, String, or Boolean (reference Value enum,
    * `src/value/mod.rs:201-223`). */
  final case class Const(value: Any) extends Term
  /** Anonymous variable `_` — matches anything, binds nothing. */
  case object Wildcard extends Term
  /** Arithmetic over terms: + - * / % (reference `src/ast/mod.rs:403-459`). */
  final case class Arith(op: String, l: Term, r: Term) extends Term
  /** Builtin scalar function call (reference BuiltinFunc, `src/ast/mod.rs:58-197`). */
  final case class Func(name: String, args: Seq[Term]) extends Term
  /** Aggregate term — legal only in rule heads: `sum<X>`, `count<X>`,
    * `min<X>`, `max<X>`, `avg<X>`, `count_distinct<X>`
    * (reference `src/ast/mod.rs:22-56`). */
  final case class Agg(func: String, arg: Term) extends Term

  /** Ranking aggregate — multi-row-per-group head term (reference
    * `src/ast/mod.rs:31-55`):
    *   `top_k<k, Out..., Order:desc>`           k best rows per group
    *   `top_k_threshold<k, t, Out..., Order:desc>`  + Order ≥ t (desc) / ≤ t (asc)
    *   `within_radius<r, Out..., Dist>`         all rows with Dist ≤ r
    * Expands to columns Out... ++ Order in the head's output. */
  final case class Rank(func: String, params: Seq[Double], outs: Seq[Var],
                        orderVar: Var, desc: Boolean) extends Term

  final case class Atom(rel: String, args: Seq[Term])

  sealed trait BodyElem
  final case class Pos(atom: Atom) extends BodyElem
  /** Stratified negation `!atom` (reference antijoin, `src/ir/mod.rs:324-338`). */
  final case class Neg(atom: Atom) extends BodyElem
  /** Comparison / binding predicate: `X < 5`, `X = Y + 1`, `X != Y`
    * (reference `src/ast/mod.rs:947-965`). `=` with an unbound left var
    * is a computed binding (reference Compute, `src/ir/mod.rs:340-347`). */
  final case class Cmp(op: String, l: Term, r: Term) extends BodyElem

  final case class Rule(head: Atom, body: Seq[BodyElem], persistent: Boolean = false)

  /** Sort annotation on query head vars: `?q(X:desc, Y)`
    * (reference `src/statement/parser.rs:533-583`). */
  final case class SortKey(varName: String, desc: Boolean)

  sealed trait Statement
  final case class InsertFacts(rel: String, rows: Seq[Seq[Any]]) extends Statement
  /** Bare `rel(1, 2)` — EPHEMERAL session fact, visible only to the
    * current session, cleared on .session clear / KG switch (reference
    * `Statement::Fact`, `src/statement/mod.rs:44-45`). */
  final case class SessionFact(rel: String, row: Seq[Any]) extends Statement
  final case class DeleteFacts(rel: String, rows: Seq[Seq[Any]]) extends Statement
  /** Conditional delete `-rel(X,...) <- body` */
  final case class DeleteWhere(atom: Atom, body: Seq[BodyElem]) extends Statement
  final case class DropRelation(rel: String) extends Statement
  final case class RuleDef(rule: Rule) extends Statement
  /** Atomic update `-old(args), +new(args) <- body` (reference
    * `Statement::Update`, `src/statement/mod.rs:39-40`): one transactional
    * delete+insert per body binding. */
  final case class Update(del: Atom, ins: Atom, body: Seq[BodyElem]) extends Statement
  /** Schema declaration `+User(id: int, name: string)` (reference
    * SchemaDecl, `src/statement/schema.rs`; types `src/schema/mod.rs:24-45`). */
  final case class SchemaDecl(rel: String, fields: Seq[(String, String)]) extends Statement
  /** Named type alias `type Email: string` (reference `src/statement/types.rs`). */
  final case class TypeAlias(alias: String, base: String) extends Statement
  /** `goal` is set for shorthand queries `?rel(args)`: the result keeps
    * the goal atom's full arity (constants included), like the reference's
    * `__query__(_c0,Y) <- rel(_c0,Y), _c0=1` rewrite
    * (`protocol/handler.rs:4753`). */
  final case class Query(body: Seq[BodyElem], sort: Seq[SortKey],
                         limit: Option[Int], offset: Option[Int],
                         goal: Option[Atom] = None) extends Statement

  final case class Program(statements: Seq[Statement])
}
