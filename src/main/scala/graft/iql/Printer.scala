package graft.iql

import Ast._

/** AST → IQL source text (used by `.rule list`, `.rel describe`, and rule
  * persistence — rules are stored as re-parseable IQL, the same way the
  * reference persists rule definitions by source). */
object Printer {

  def term(t: Term): String = t match {
    case Var(n) => n
    case Wildcard => "_"
    case Const(s: String) => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    case Const(v: Seq[_]) => v.mkString("[", ", ", "]") // vector literal
    case Const(v) => String.valueOf(v)
    case Arith(op, l, r) => s"(${term(l)} $op ${term(r)})"
    case Func(n, args) => s"$n(${args.map(term).mkString(", ")})"
    case Agg(f, a) => s"$f<${term(a)}>"
    case Rank(f, params, outs, ordVar, desc) =>
      // re-parseable form: params print as int when integral (the parser
      // accepts numeric literals and coerces to Double)
      val ps = params.map(p => if (p == p.floor && !p.isInfinite) p.toLong.toString else p.toString)
      val items = ps ++ outs.map(_.name) :+ s"${ordVar.name}:${if (desc) "desc" else "asc"}"
      s"$f<${items.mkString(", ")}>"
  }

  def atom(a: Atom): String = s"${a.rel}(${a.args.map(term).mkString(", ")})"

  def bodyElem(e: BodyElem): String = e match {
    case Pos(a) => atom(a)
    case Neg(a) => s"!${atom(a)}"
    case Cmp(op, l, r) => s"${term(l)} $op ${term(r)}"
  }

  def rule(r: Rule): String = {
    val prefix = if (r.persistent) "+" else ""
    s"$prefix${atom(r.head)} <- ${r.body.map(bodyElem).mkString(", ")}"
  }

  def schemaDecl(rel: String, fields: Seq[(String, String)]): String =
    s"+$rel(${fields.map { case (n, t) => s"$n: $t" }.mkString(", ")})"
}
