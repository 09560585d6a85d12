package graft.iql

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Cross-type `Value` total order over dynamically-typed columns —
  * reference `src/value/mod.rs:493-547`: same-type compares naturally;
  * across types the order is categorical (`Null < Bool < Int < Float <
  * String < Vector`), so Int64(100) < Float64(0.5). Exercised through
  * declared `any` columns, mixed-type inferred columns, and
  * widen-on-conflict inserts. */
class AnyValueSpec extends SparkSpec {

  private def engine = new Engine(new Catalog(spark))

  private def decoded(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq.map {
      case r: Row if AnyValue.isAnyRow(r) => AnyValue.decode(r)
      case other => other
    })

  test("declared any column sorts in the reference cross-type order") {
    val e = engine
    e.run(
      """+m(id: int, x: any)
        |+m[(1, "zeta"), (2, 3.5), (3, 100), (4, true), (5, [1.0, 2.0]), (6, 0.5)]
        |""".stripMargin)
    val out = decoded(e.run("?m(Id, X:asc)").last).map(_(1))
    // Bool < Int < Float (categorically: int 100 below float 0.5) < String < Vector
    assert(out.take(4) == Seq(true, 100L, 0.5, 3.5))
    assert(out(4) == "zeta")
    assert(out(5).asInstanceOf[Seq[Float]] == Seq(1.0f, 2.0f))
  }

  test("min/max over a mixed column follow the cross-type order") {
    val e = engine
    e.run(
      """+m(id: int, x: any)
        |+m[(1, "a"), (2, 7.5), (3, 100), (4, [0.5])]
        |+lo(min<X>) <- m(_, X)
        |+hi(max<X>) <- m(_, X)
        |""".stripMargin)
    assert(decoded(e.run("?lo(V)").last) == Seq(Seq(100L))) // int slot lowest present
    val hi = decoded(e.run("?hi(V)").last).head.head
    assert(hi.asInstanceOf[Seq[Float]] == Seq(0.5f)) // vector slot highest
  }

  test("vector order: length first, then unsigned IEEE bits") {
    val e = engine
    e.run(
      """+m(x: any)
        |+m[([9.0, 9.0]), ([1.0, 2.0, 3.0]), ([-1.0]), ([1.0])]
        |""".stripMargin)
    val out = decoded(e.run("?m(X:asc)").last).map(_.head.asInstanceOf[Seq[Float]])
    // len 1 before len 2 before len 3; within len 1, unsigned bit order
    // puts the negative float ABOVE the positive (sign bit set = larger
    // u32) — reference src/value/mod.rs:500-514
    assert(out == Seq(Seq(1.0f), Seq(-1.0f), Seq(9.0f, 9.0f), Seq(1.0f, 2.0f, 3.0f)))
  }

  test("equality and range filters against any columns") {
    val e = engine
    e.run(
      """+m(id: int, x: any)
        |+m[(1, 5), (2, "5"), (3, 5.0), (4, 2)]
        |""".stripMargin)
    // literal 5 matches only the int-tagged 5 — not "5", not 5.0
    assert(decoded(e.run("?m(Id, 5)").last).map(_.head) == Seq(1L))
    // X > 4 under the cross-type order: ints above 4, ALL floats, the string
    val gt = decoded(e.run("?m(Id:asc, X), X > 4").last).map(_.head)
    assert(gt == Seq(1L, 2L, 3L))
  }

  test("mixed-type first batch infers a dynamic column") {
    val e = engine
    e.run("""+m[(1, "x"), (2, 9)]""")
    val out = decoded(e.run("?m(Id, X:asc)").last)
    assert(out == Seq(Seq(2L, 9L), Seq(1L, "x"))) // int slot < string slot
  }

  test("widen-on-conflict: later insert of a new type re-encodes the column") {
    val e = engine
    e.run("+m[(1, 10), (2, 20)]") // inferred int column
    e.run("""+m[(3, "s")]""") // widen → AnyValue
    val out = decoded(e.run("?m(Id, X:asc)").last)
    assert(out == Seq(Seq(1L, 10L), Seq(2L, 20L), Seq(3L, "s")))
    // int→float conflict widens numerically instead (inference parity)
    val e2 = engine
    e2.run("+n[(1, 10)]")
    e2.run("+n[(2, 2.5)]")
    assert(rows(e2.run("?n(Id, X), X > 3.0").last) == Set(Seq(1L, 10.0)))
  }

  test("joins harmonize a dynamic column with a typed one") {
    val e = engine
    e.run(
      """+m(x: any)
        |+m[(1), ("k"), (2.0)]
        |+t[(1), (2)]
        |+both(X) <- m(X), t(X)
        |""".stripMargin)
    // int 1 matches; float 2.0 does NOT match int 2 (distinct Value types)
    assert(decoded(e.run("?both(X)").last) == Seq(Seq(1L)))
  }

  test("negation joins harmonize dynamic columns") {
    val e = engine
    e.run(
      """+m(x: any)
        |+m[(1), ("k")]
        |+t[(1), (2)]
        |+only(X) <- m(X), !t(X)
        |""".stripMargin)
    assert(decoded(e.run("?only(X)").last) == Seq(Seq("k")))
  }

  test("sum/avg over dynamic columns use to_i64/to_f64 coercion") {
    val e = engine
    e.run(
      """+m(id: int, x: any)
        |+m[(1, 3), (2, 2.7), (3, "skip"), (4, true)]
        |+s(sum<X>) <- m(_, X)
        |+a(avg<X>) <- m(_, X)
        |+c(count_distinct<X>) <- m(_, X)
        |""".stripMargin)
    // to_i64: 3 + 2 + 0 + 1 (reference src/code_generator/mod.rs:2660-2669)
    assert(rows(e.run("?s(V)").last) == Set(Seq(6L)))
    // to_f64: (3 + 2.7 + 0 + 1) / 4
    val avg = rows(e.run("?a(V)").last).head.head.asInstanceOf[Double]
    assert(math.abs(avg - 6.7 / 4) < 1e-9)
    assert(rows(e.run("?c(V)").last) == Set(Seq(4L)))
  }

  test("delete exact tuples from a dynamic column") {
    val e = engine
    e.run(
      """+m(x: any)
        |+m[(1), ("k"), (2.5)]
        |""".stripMargin)
    e.run("""-m("k")""")
    assert(decoded(e.run("?m(X:asc)").last) == Seq(Seq(1L), Seq(2.5)))
  }

  test("aggregate views over dynamic columns maintain incrementally") {
    val e = engine
    e.run(
      """+m(id: int, x: any)
        |+m[(1, 5), (2, "q")]
        |+mx(max<X>) <- m(_, X)
        |""".stripMargin)
    assert(decoded(e.run("?mx(V)").last) == Seq(Seq("q"))) // string above int
    e.run("""+m[(3, 9)]""") // monotone insert below current max
    assert(decoded(e.run("?mx(V)").last) == Seq(Seq("q")))
    e.run("""+m[(4, [1.0])]""") // vector: new cross-type max
    assert(decoded(e.run("?mx(V)").last).head.head
      .asInstanceOf[Seq[Float]] == Seq(1.0f))
    assert(e.maintainedCount >= 1,
      "mergeable max over a dynamic column should merge, not recompute")
  }

  test("appendDf encodes typed frames into dynamic columns") {
    import spark.implicits._
    val e = engine
    e.run("""+m(x: any)
            |+m[("seed")]""".stripMargin)
    e.catalog.appendDf("m", Seq(7L, 9L).toDF("x"))
    assert(decoded(e.run("?m(X:asc)").last).map(_.head) == Seq(7L, 9L, "seed"))
  }

  test("dynamic columns round-trip through .save/.open") {
    val s1 = new Session(spark)
    s1.execute("+m(x: any)")
    s1.execute("""+m[(1), ("k"), (2.5), (true)]""")
    val dir = java.nio.file.Files.createTempDirectory("graft_any_save").toString
    s1.execute(s".save $dir")
    val s2 = new Session(spark)
    s2.execute(s".open $dir")
    val out = s2.execute("?m(X:asc)").collectFirst {
      case Repl.Table(df) => decoded(df).map(_.head)
    }.get
    assert(out == Seq(true, 1L, 2.5, "k"))
  }

  test(".rel describe prints any for dynamic columns") {
    val s = new Session(spark)
    s.execute("+m(id: int, x: any)")
    val lines = s.execute(".rel describe m").collect {
      case Repl.Text(ls) => ls
    }.flatten
    assert(lines == Seq("id: bigint", "x: any"))
  }

  test("recursion over dynamic columns (mixed-type node ids)") {
    val e = engine
    e.run(
      """+edge(a: any, b: any)
        |+edge[(1, "x"), ("x", 2.5), (2.5, true)]
        |+reach(X, Y) <- edge(X, Y)
        |+reach(X, Z) <- reach(X, Y), edge(Y, Z)
        |""".stripMargin)
    val out = decoded(e.run("?reach(X, Y)").last)
    assert(out.size == 6) // 3 edges + (1,2.5) (1,true) ("x",true)
    assert(out.contains(Seq(1L, true)))
  }

  test("any columns harmonize with registered timestamp columns as ms-epoch ints") {
    val e = engine
    e.catalog.register("evt", spark.sql(
      "SELECT timestamp_millis(1000) AS t UNION ALL SELECT timestamp_millis(2000)"))
    e.run(
      """+m(x: any)
        |+m[(1000), ("x")]
        |+hit(X) <- m(X), evt(X)
        |""".stripMargin)
    assert(decoded(e.run("?hit(X)").last) == Seq(Seq(1000L)))
  }

  test("any columns harmonize with smallint and decimal registered columns") {
    val e = engine
    e.catalog.register("st", spark.sql(
      "SELECT CAST(5 AS SMALLINT) AS v UNION ALL SELECT CAST(9 AS SMALLINT)"))
    e.catalog.register("dc", spark.sql(
      "SELECT CAST(2.5 AS DECIMAL(5,2)) AS v UNION ALL SELECT CAST(7.0 AS DECIMAL(5,2))"))
    e.run(
      """+m(x: any)
        |+m[(5), (2.5), ("never")]
        |+hs(X) <- m(X), st(X)
        |+hd(X) <- m(X), dc(X)
        |""".stripMargin)
    // smallint 5 lands in the int slot, decimal 2.5 in the float slot —
    // NOT the string slot (which would silently match nothing)
    assert(decoded(e.run("?hs(X)").last) == Seq(Seq(5L)))
    assert(decoded(e.run("?hd(X)").last) == Seq(Seq(2.5)))
  }

  test("fuzz: engine sort equals the reference comparator on random mixed values") {
    val rnd = new scala.util.Random(42)
    def randVal(): Any = rnd.nextInt(5) match {
      case 0 => rnd.nextBoolean()
      case 1 => rnd.nextInt(200).toLong - 100L
      case 2 => (rnd.nextInt(800) - 400) / 4.0
      case 3 => rnd.alphanumeric.take(rnd.nextInt(5)).mkString
      case _ => Seq.fill(rnd.nextInt(3) + 1)((rnd.nextFloat() - 0.5f) * 10f)
    }
    // direct Scala transcription of the reference Ord (src/value/mod.rs:493-547)
    def tagOf(v: Any): Int = v match {
      case _: Boolean => 1; case _: Long => 2; case _: Double => 3
      case _: String => 4; case _: Seq[_] => 5
    }
    def cmp(a: Any, b: Any): Int = {
      val (ta, tb) = (tagOf(a), tagOf(b))
      if (ta != tb) ta - tb
      else (a, b) match {
        case (x: Boolean, y: Boolean) => x.compareTo(y)
        case (x: Long, y: Long) => x.compareTo(y)
        case (x: Double, y: Double) => x.compareTo(y)
        case (x: String, y: String) => x.compareTo(y)
        case (x: Seq[_], y: Seq[_]) =>
          if (x.length != y.length) x.length - y.length
          else x.zip(y).map { case (f: Float, g: Float) =>
            java.lang.Integer.compareUnsigned(
              java.lang.Float.floatToIntBits(f), java.lang.Float.floatToIntBits(g))
          }.find(_ != 0).getOrElse(0)
      }
    }
    val vals = Seq.fill(60)(randVal())
    val e = engine
    e.catalog.insert("fz", vals.zipWithIndex.map { case (v, i) => Seq(i.toLong, v) })
    val got = decoded(e.run("?fz(I, X:asc)").last).map(_(1))
    val want = vals.sorted(Ordering.fromLessThan[Any]((a, b) => cmp(a, b) < 0))
    assert(got.length == want.length)
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(cmp(g, w) == 0, s"position $i: engine=$g reference=$w")
    }
  }

  test("duplicate dynamic facts collapse (set semantics)") {
    val e = engine
    e.run(
      """+m(x: any)
        |+m[("a"), ("a"), (1), (1)]
        |""".stripMargin)
    assert(decoded(e.run("?m(X)").last).size == 2)
  }
}
