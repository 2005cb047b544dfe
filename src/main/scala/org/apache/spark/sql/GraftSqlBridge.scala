package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Bridge into Spark's sql-private Column↔Expression conversions for the
 * graft engine's native expressions (Spark 4 made Column ColumnNode-backed;
 * extension libraries reach the classic converters through a same-package
 * shim — the established pattern for DataSource/extension projects).
 */
/** A FilePartition that also reports its hash-bucket ids as the partition
  * key — the unit Spark's storage-partitioned join groups on. Multi-
  * component hash layouts report one key field per component (the
  * composite id decoded back into per-component bucket ids, matching the
  * one-bucket-transform-per-component KeyGroupedPartitioning); the
  * composite id itself stays available for per-bucket delta routing. */
class GraftKeyedFilePartition(
    index: Int,
    files: Array[execution.datasources.PartitionedFile],
    val bucketIds: Array[Int],
    val compositeBucket: Int)
  extends execution.datasources.FilePartition(index, files)
  with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): catalyst.InternalRow =
    new catalyst.expressions.GenericInternalRow(
      bucketIds.map(b => b: Any))
}

/** A FilePartition carrying an opaque delta-route key, for layouts that
  * report no key grouping (multi-column hash components; per-range hash
  * overrides, where a bucket id is only meaningful within its own range's
  * modulus): the route tells the merge-on-read overlay which upsert rows
  * this split owns, without claiming any partition key toward Spark. */
class GraftRoutedFilePartition(
    index: Int,
    files: Array[execution.datasources.PartitionedFile],
    val route: String)
  extends execution.datasources.FilePartition(index, files)

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

  /** One DSv2 input partition over `paths`, optionally keyed by hash
    * bucket ids for storage-partitioned joins (HasPartitionKey is how a V2
    * scan tells Spark which key-group a split belongs to). `key` carries
    * (per-component bucket ids, composite id); single-component layouts
    * pass one id that is both. */
  def filePartition(index: Int, paths: Seq[String],
      key: Option[(Seq[Int], Int)]): execution.datasources.FilePartition =
    key match {
      case Some((ids, composite)) =>
        new GraftKeyedFilePartition(index, partitionedFiles(paths), ids.toArray, composite)
      case None => execution.datasources.FilePartition(index, partitionedFiles(paths))
    }

  /** One DSv2 input partition owning the delta-route `route` (see
    * [[GraftRoutedFilePartition]]); `paths` may be empty — an empty split
    * still runs a task, so its routed delta rows are emitted. */
  def routedFilePartition(index: Int, paths: Seq[String],
      route: String): execution.datasources.FilePartition =
    new GraftRoutedFilePartition(index, partitionedFiles(paths), route)

  private def partitionedFiles(
      paths: Seq[String]): Array[execution.datasources.PartitionedFile] = {
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    paths.map { p =>
      val path = new org.apache.hadoop.fs.Path(p)
      val status = path.getFileSystem(conf).getFileStatus(path)
      execution.datasources.PartitionedFile(
        catalyst.InternalRow.empty,
        org.apache.spark.paths.SparkPath.fromPath(path),
        0L, status.getLen, Array.empty[String],
        status.getModificationTime, status.getLen,
        Map.empty)
    }.toArray
  }

  /** The stock vectorized parquet reader factory, reused for the graft V2
    * batch scan (the standard extension move — file formats are not
    * re-implemented per source). */
  def parquetReaderFactory(
      session: SparkSession,
      dataSchema: types.StructType,
      readSchema: types.StructType,
      filters: Array[sources.Filter])
      : org.apache.spark.sql.connector.read.PartitionReaderFactory = {
    import execution.datasources.parquet.{ParquetReadSupport, ParquetWriteSupport}
    import org.apache.spark.sql.internal.SQLConf
    val spark = session.asInstanceOf[classic.SparkSession]
    val sqlConf = spark.sessionState.conf
    val hconf = spark.sessionState.newHadoopConf()
    // the conf plumbing ParquetScan.createReaderFactory performs before
    // handing the broadcast conf to the factory
    hconf.set(org.apache.parquet.hadoop.ParquetInputFormat.READ_SUPPORT_CLASS,
      classOf[ParquetReadSupport].getName)
    hconf.set(ParquetReadSupport.SPARK_ROW_REQUESTED_SCHEMA, readSchema.json)
    hconf.set(ParquetWriteSupport.SPARK_ROW_SCHEMA, readSchema.json)
    hconf.set(SQLConf.SESSION_LOCAL_TIMEZONE.key, sqlConf.sessionLocalTimeZone)
    hconf.setBoolean(SQLConf.NESTED_SCHEMA_PRUNING_ENABLED.key,
      sqlConf.nestedSchemaPruningEnabled)
    hconf.setBoolean(SQLConf.CASE_SENSITIVE.key, sqlConf.caseSensitiveAnalysis)
    ParquetWriteSupport.setSchema(readSchema, hconf)
    hconf.setBoolean(SQLConf.PARQUET_BINARY_AS_STRING.key,
      sqlConf.isParquetBinaryAsString)
    hconf.setBoolean(SQLConf.PARQUET_INT96_AS_TIMESTAMP.key,
      sqlConf.isParquetINT96AsTimestamp)
    hconf.setBoolean(SQLConf.LEGACY_PARQUET_NANOS_AS_LONG.key,
      sqlConf.legacyParquetNanosAsLong)
    hconf.setBoolean(SQLConf.PARQUET_INFER_TIMESTAMP_NTZ_ENABLED.key,
      sqlConf.parquetInferTimestampNTZEnabled)
    val broadcastConf = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(hconf))
    new execution.datasources.v2.parquet.ParquetPartitionReaderFactory(
      spark.sessionState.conf,
      broadcastConf,
      dataSchema,
      readSchema,
      types.StructType(Nil), // no dir-derived partition columns
      filters,
      None,
      new execution.datasources.parquet.ParquetOptions(
        Map.empty[String, String], spark.sessionState.conf))
  }

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
