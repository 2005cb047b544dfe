package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Bridge into Spark's sql-private Column↔Expression conversions for the
 * graft engine's native expressions (Spark 4 made Column ColumnNode-backed;
 * extension libraries reach the classic converters through a same-package
 * shim — the established pattern for DataSource/extension projects).
 */
object GraftSqlBridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Catalyst data filter → public sources.Filter (for metadata pruning). */
  def translateFilter(e: Expression): Option[sources.Filter] =
    org.apache.spark.sql.execution.datasources.DataSourceStrategy
      .translateFilter(e, supportNestedPredicatePushdown = false)

  /** Re-wrap an already-executed plan's InternalRow RDD as a batch
    * DataFrame WITHOUT moving rows to the driver — the standard pattern for
    * streaming Sinks (the incoming micro-batch DataFrame carries a streaming
    * plan that batch writers refuse; its toRdd stays on the executors). */
  def internalCreateDataFrame(
      session: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: types.StructType): DataFrame =
    session.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = false)

  /** DataFrame over a HadoopFsRelation built on a custom FileIndex — the
    * extension-library path to metadata-controlled file listings. */
  def ofFileIndex(
      session: SparkSession,
      index: org.apache.spark.sql.execution.datasources.FileIndex,
      dataSchema: types.StructType): DataFrame = {
    val spark = session.asInstanceOf[classic.SparkSession]
    val relation = org.apache.spark.sql.execution.datasources.HadoopFsRelation(
      location = index,
      partitionSchema = types.StructType(Nil),
      dataSchema = dataSchema,
      bucketSpec = None,
      fileFormat =
        new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat,
      options = Map.empty)(spark)
    classic.Dataset.ofRows(spark,
      org.apache.spark.sql.execution.datasources.LogicalRelation(relation))
  }
}
