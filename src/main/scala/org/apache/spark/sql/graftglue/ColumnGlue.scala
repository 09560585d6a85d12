package org.apache.spark.sql.graftglue

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.StructType

/** Spark 4 moved Column↔Expression conversion behind `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`). This glue object —
  * placed under the `org.apache.spark.sql` package like any Spark
  * extension that registers custom expressions — re-exports the two
  * conversions graft's codegen'd kernels need, plus the one
  * internal-row constructor `Fixpoint.materialize` needs to re-bind a
  * local checkpoint to a session WITHOUT the InternalRow→Row→InternalRow
  * conversion pair that `createDataFrame(ck.rdd, schema)` inserts (a
  * pair every later read of the materialized frame would pay). No
  * other internals are touched. */
object ColumnGlue {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def internalCreateDataFrame(sess: SparkSession, rdd: RDD[InternalRow],
                              schema: StructType): DataFrame =
    sess.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
