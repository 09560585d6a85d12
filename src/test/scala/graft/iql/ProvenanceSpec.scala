package graft.iql

import graft.SparkSpec

class ProvenanceSpec extends SparkSpec {

  private def sessionWith(src: String): Session = {
    val s = new Session(spark)
    s.execute(src)
    s
  }

  private def text(r: Seq[Repl.Result]): Seq[String] =
    r.head.asInstanceOf[Repl.Text].lines

  test("why on a base fact yields a fact leaf") {
    val s = sessionWith("+edge[(1,2),(2,3)]")
    assert(text(s.execute(".why edge(1, 2)")) == Seq("fact edge(1, 2)"))
  }

  test("why on a derived tuple shows the full derivation chain") {
    val s = sessionWith(
      """+edge[(1,2),(2,3)]
        |+reach(X, Y) <- edge(X, Y)
        |+reach(X, Z) <- reach(X, Y), edge(Y, Z)
        |""".stripMargin)
    val proof = text(s.execute(".why reach(1, 3)"))
    // derived via the recursive rule from reach(1,2) and edge(2,3)
    assert(proof.head.startsWith("reach(1, 3) <= "))
    assert(proof.exists(_.trim == "fact edge(2, 3)") || proof.exists(_.trim == "fact edge(1, 2)"))
    assert(proof.exists(_.contains("reach(1, 2)")))
  }

  test("why respects negation and reports the check") {
    val s = sessionWith(
      """+p[(1),(2)]
        |+blocked[(2)]
        |+ok(X) <- p(X), !blocked(X)
        |""".stripMargin)
    val proof = text(s.execute(".why ok(1)"))
    assert(proof.exists(_.contains("no blocked(X) exists")))
    assert(text(s.execute(".why ok(2)")).head.contains("not derivable"))
  }

  test("why_not identifies the blocking atom") {
    val s = sessionWith(
      """+edge[(1,2)]
        |+reach(X, Y) <- edge(X, Y)
        |+reach(X, Z) <- reach(X, Y), edge(Y, Z)
        |""".stripMargin)
    val lines = text(s.execute(".why_not reach(1, 9)"))
    assert(lines.exists(_.contains("blocked at")))
  }

  test("why_not on a derivable tuple points back to why") {
    val s = sessionWith("+edge[(1,2)]\n+reach(X, Y) <- edge(X, Y)")
    assert(text(s.execute(".why_not reach(1, 2)")).head.contains("IS derivable"))
  }

  test("why_not on unknown relation says so") {
    val s = sessionWith("+p[(1)]")
    assert(text(s.execute(".why_not nope(1)")).head.contains("does not exist"))
  }
}
