package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Salting changes the shuffle layout, never the result: every test is
  * an equality against the unsalted plan. */
class SkewSpec extends SparkSpec {

  private lazy val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")
  private lazy val customer = Tables.load(spark, "/root/testdata/sf0.001", "customer")
  private lazy val lineitem = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")

  test("salted join equals the plain join row-for-row") {
    val big = orders.select(col("o_orderkey"), col("o_custkey").as("custkey"))
    val small = customer.select(col("c_custkey").as("custkey"), col("c_name"))
    val salted = Skew.saltedJoin(big, small, "custkey", salts = 8)
    val plain = big.join(small, Seq("custkey"))
    assert(rows(salted) == rows(plain))
    assert(!salted.columns.contains("__salt"), "salt leaked into the output")
  }

  test("salted two-phase aggregation equals the direct aggregation exactly") {
    val salted = Skew.saltedSumCount(lineitem, Seq("l_returnflag"),
      col("l_extendedprice"), salts = 16)
    val direct = lineitem.groupBy("l_returnflag")
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum"),
        count(lit(1)).as("cnt"))
    assert(rows(salted) == rows(direct))
    // a pathological single hot key still merges to one exact row
    val hot = lineitem.withColumn("k", lit("hot"))
    val hotSalted = Skew.saltedSumCount(hot, Seq("k"), col("l_quantity"), salts = 32)
    val hotDirect = hot.groupBy("k")
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum"),
        count(lit(1)).as("cnt"))
    assert(rows(hotSalted) == rows(hotDirect))
  }
}
