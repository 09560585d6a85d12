package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grouped statistics beyond the plain aggregate suite — shaped like
  * every other aggregate here: partial-aggregated power sums in
  * DECIMAL (order-independent, exact for fixed-scale inputs), one
  * closing scalar formula.
  */
object Stats {

  /** Grouped Pearson correlation: the five power sums are exact
    * decimals (inputs cast to DECIMAL(18,2); products widen to scale 4
    * without truncation, sums widen precision only) — fully
    * order-independent and partial-aggregated — and the closing
    * formula (n·Σxy − Σx·Σy) / (√(n·Σx² − Σx²ᵗᵒᵗ) · √(n·Σy² − Σy²ᵗᵒᵗ))
    * runs once over their double casts, rounded to 10 dp. The rounding
    * exists because engines cast a non-integer decimal to double
    * differently at the last ulp (the JVM's BigDecimal cast is
    * correctly rounded; DuckDB divides the unscaled value by 10^scale
    * in double — two roundings), measured as 1-ulp corr drift; the
    * one-shot 10-dp grid pins it, the established q108/PageRank
    * stance. Zero-variance groups yield NULL (the SQL convention)
    * rather than a NaN that engines hash differently. */
  def groupedCorr(df: DataFrame, groupCol: String, xCol: Column,
                  yCol: Column): DataFrame = {
    val x = xCol.cast("decimal(18,2)")
    val y = yCol.cast("decimal(18,2)")
    val agg = df.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n"),
      sum(x).cast("double").as("sx"), sum(y).cast("double").as("sy"),
      sum(x * y).cast("double").as("sxy"),
      sum(x * x).cast("double").as("sxx"),
      sum(y * y).cast("double").as("syy"))
    val nd = col("n").cast("double")
    val cov = nd * col("sxy") - col("sx") * col("sy")
    val vx = nd * col("sxx") - col("sx") * col("sx")
    val vy = nd * col("syy") - col("sy") * col("sy")
    agg.select(col(groupCol), col("n"),
      when(col("n") > 1 && vx > 0 && vy > 0,
        round(cov / (sqrt(vx) * sqrt(vy)), 10)).as("corr"))
  }

  /** DuckDB replication of [[groupedCorr]] — identical decimal sums and
    * the identical double chain (sub-expression per name so both plans
    * evaluate the same tree). */
  def groupedCorrOracleSql(table: String, groupCol: String, xExpr: String,
                           yExpr: String): String =
    s"""WITH s AS (SELECT $groupCol,
       |  COUNT(*) AS n,
       |  CAST(SUM(CAST($xExpr AS DECIMAL(18,2))) AS DOUBLE) AS sx,
       |  CAST(SUM(CAST($yExpr AS DECIMAL(18,2))) AS DOUBLE) AS sy,
       |  CAST(SUM(CAST($xExpr AS DECIMAL(18,2)) * CAST($yExpr AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
       |  CAST(SUM(CAST($xExpr AS DECIMAL(18,2)) * CAST($xExpr AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
       |  CAST(SUM(CAST($yExpr AS DECIMAL(18,2)) * CAST($yExpr AS DECIMAL(18,2))) AS DOUBLE) AS syy
       |  FROM $table GROUP BY $groupCol)
       |SELECT $groupCol, n,
       |  CASE WHEN n > 1 AND (CAST(n AS DOUBLE) * sxx - sx * sx) > 0
       |            AND (CAST(n AS DOUBLE) * syy - sy * sy) > 0
       |       THEN ROUND((CAST(n AS DOUBLE) * sxy - sx * sy) /
       |            (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx) *
       |             sqrt(CAST(n AS DOUBLE) * syy - sy * sy)), 10)
       |       ELSE NULL END AS corr
       |FROM s""".stripMargin
}
