package graft.iql

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Relation + rule catalog for one knowledge graph (reference: per-KG
  * relation/rule storage, `src/storage_engine/mod.rs`; schema inference
  * from first insert, `src/value/arrow_convert.rs`).
  *
  * Base relations (EDB) are DataFrames — inline facts become in-memory
  * frames, and external parquet tables can be registered directly, which
  * is how the engine scales: an IQL rule over a registered 100 TB parquet
  * relation compiles to a plan whose scan IS that parquet source with
  * pushdown intact.
  */
final class Catalog(val spark: SparkSession) {

  private val relations = mutable.LinkedHashMap.empty[String, DataFrame]
  private val ruleList = mutable.ArrayBuffer.empty[Ast.Rule]

  def register(name: String, df: DataFrame): Unit = relations(name) = df

  def relation(name: String): Option[DataFrame] = relations.get(name)

  def relationNames: Seq[String] = relations.keys.toSeq

  def rules: Seq[Ast.Rule] = ruleList.toSeq

  def addRule(rule: Ast.Rule): Unit = ruleList += rule

  def dropRelation(name: String): Unit = {
    relations.remove(name)
    val remaining = ruleList.filterNot(_.head.rel == name)
    ruleList.clear()
    ruleList ++= remaining
  }

  /** Schema inference from the first inserted batch (reference
    * `infer_schema_from_tuples`): Long / Double / String / Boolean. */
  private def inferSchema(rows: Seq[Seq[Any]]): StructType = {
    val arity = rows.head.length
    StructType((0 until arity).map { i =>
      val dt = rows.iterator.map(_(i)).collectFirst {
        case _: Long => LongType
        case _: Int => LongType
        case _: Double => DoubleType
        case _: Boolean => BooleanType
        case _: String => StringType
      }.getOrElse(StringType)
      StructField(s"c$i", dt, nullable = true)
    })
  }

  private def toRows(rows: Seq[Seq[Any]], schema: StructType): Seq[org.apache.spark.sql.Row] =
    rows.map { r =>
      org.apache.spark.sql.Row.fromSeq(r.zip(schema.fields).map {
        case (v: Int, f) if f.dataType == LongType => v.toLong
        case (v: Long, f) if f.dataType == DoubleType => v.toDouble
        case (v, _) => v
      })
    }

  /** Insert facts; creates the relation (inferring a schema) on first use.
    * All-or-nothing per batch like the reference (`src/schema/mod.rs:1-8`). */
  def insert(name: String, rows: Seq[Seq[Any]]): Unit = {
    if (rows.isEmpty) return
    relations.get(name) match {
      case None =>
        val schema = inferSchema(rows)
        relations(name) = spark.createDataFrame(
          spark.sparkContext.parallelize(toRows(rows, schema)), schema)
      case Some(df) =>
        require(rows.forall(_.length == df.schema.length),
          s"arity mismatch inserting into $name: expected ${df.schema.length}")
        val add = spark.createDataFrame(
          spark.sparkContext.parallelize(toRows(rows, df.schema)), df.schema)
        relations(name) = df.union(add)
    }
  }

  /** Delete exact tuples (set semantics — reference `DeleteOp`). */
  def delete(name: String, rows: Seq[Seq[Any]]): Unit =
    relations.get(name).foreach { df =>
      val del = spark.createDataFrame(
        spark.sparkContext.parallelize(toRows(rows, df.schema)), df.schema)
      relations(name) = df.join(del, df.columns.toSeq, "left_anti")
    }

  /** Replace a relation's contents (conditional delete / atomic update). */
  def replace(name: String, df: DataFrame): Unit = relations(name) = df
}
