package graft.iql

import graft.SparkSpec
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import scala.util.Try

/** Concurrent readers/writers over one engine and over separate sessions
  * sharing a catalog — the tier the reference covers with
  * `tests/concurrency_tests.rs`, `write_concurrency_tests.rs`, and
  * `lock_stress_tests.rs`. Assertions: no exceptions, snapshot-consistent
  * results (a query sees some prefix of the inserts, never a torn state),
  * and correct final contents. */
class ConcurrencySpec extends SparkSpec {

  test("concurrent inserts and queries keep snapshot consistency") {
    // one shared catalog, one engine PER THREAD — the wire server's
    // actual sharing model (per-connection sessions over shared KGs)
    val cat = new Catalog(spark)
    new Engine(cat).run("+acc[(0, 0)]\n+total(sum<V>) <- acc(K, V)")
    val pool = Executors.newFixedThreadPool(8)
    val start = new CountDownLatch(1)
    val writers = 4
    val perWriter = 10
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    (0 until writers).foreach { w =>
      pool.submit(new Runnable {
        def run(): Unit = {
          start.await()
          val e = new Engine(cat)
          (1 to perWriter).foreach { i =>
            Try(e.run(s"+acc[(${w * 1000 + i}, 1)]"))
              .failed.foreach(errors.add)
          }
        }
      })
    }
    val readerResults = new java.util.concurrent.ConcurrentLinkedQueue[Long]
    (0 until 4).foreach { _ =>
      pool.submit(new Runnable {
        def run(): Unit = {
          start.await()
          val e = new Engine(cat)
          (1 to 5).foreach { _ =>
            Try {
              val r = rows(e.run("?total(S)").last)
              readerResults.add(r.head.head.asInstanceOf[Long])
            }.failed.foreach(errors.add)
          }
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS), "stress pool timed out")
    assert(errors.isEmpty, s"concurrent ops failed: ${errors.peek()}")
    // every observed running total is a valid prefix sum (0..writers*perWriter)
    readerResults.forEach(v => assert(v >= 0L && v <= (writers * perWriter).toLong,
      s"torn read: $v"))
    val fin = rows(new Engine(cat).run("?total(S)").last)
    assert(fin == Set(Seq((writers * perWriter).toLong)))
  }

  test("concurrent recursive queries on isolated engines don't interleave") {
    // two engines on one SparkSession, each running a fixpoint whose loop
    // conf (shuffle partitions, AQE) must not leak across threads
    val mkSrc = (n: Int) => {
      val edges = (0 until n).map(i => s"($i, ${i + 1})").mkString(",")
      s"+edge$n[$edges]\n+tc$n(X, Y) <- edge$n(X, Y)\n+tc$n(X, Z) <- tc$n(X, Y), edge$n(Y, Z)\n?tc$n(X, Y)"
    }
    val pool = Executors.newFixedThreadPool(2)
    val out = new java.util.concurrent.ConcurrentHashMap[Int, Int]
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    Seq(30, 40).foreach { n =>
      pool.submit(new Runnable {
        def run(): Unit = Try {
          val e = new Engine(new Catalog(spark))
          out.put(n, rows(e.run(mkSrc(n)).last).size)
        }.failed.foreach(errors.add)
      })
    }
    pool.shutdown()
    assert(pool.awaitTermination(180, TimeUnit.SECONDS))
    assert(errors.isEmpty, s"concurrent fixpoints failed: ${errors.peek()}")
    assert(out.get(30) == 30 * 31 / 2)
    assert(out.get(40) == 40 * 41 / 2)
  }
}
