package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-statement wall-time breakdown of the q183 cd-retraction rounds —
  * the working profiler behind its job-count tuning. */
object ProfileQ183 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[p183] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val e = new graft.iql.Engine(new graft.iql.Catalog(spark))
    time("register")(e.catalog.register("cemp2",
      graft.sources.Tables.load(spark, dir, "orders").select(
        col("o_orderkey").as("id"),
        pmod(col("o_custkey"), lit(100L)).as("dept"),
        pmod(floor(col("o_totalprice")).cast("long"), lit(500L)).as("sal"))))
    time("rule+initial eval")(e.run(
      "+cdt(D, count_distinct<S>, count<S>) <- cemp2(I, D, S)\n?cdt(D, C, N)"))
    time("cond delete d7")(e.run("-cemp2(I, D, S) <- cemp2(I, D, S), D = 7"))
    time("requery 1 (seed+decrement)")(e.run("?cdt(D, C, N)"))
    time("cond delete d11")(e.run(
      "-cemp2(I, D, S) <- cemp2(I, D, S), D = 11, S < 250, I % 2 = 0"))
    time("requery 2 (carried)")(e.run("?cdt(D, C, N)"))
    println(s"[p183] decrements=${e.aggDecrementCount} seeds=${e.auxSupportSeeds}")
    spark.stop()
  }
}
