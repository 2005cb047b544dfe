package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.StructType

import graft.catalog.{DataFileMeta, TableMeta}

/**
 * Catalyst-integrated file listing for graft base filesets: when the
 * optimizer pushes data filters down to the scan, [[listFiles]] prunes
 * hash-bucket and range-partition files from table metadata BEFORE any file
 * is opened — the DataFrame-path equivalent of the reference's client-side
 * partition pruning (client/scanner-internal.cc:575 PartitionPruner), with
 * no custom planner rule (the FileIndex seam is where Spark asks).
 */
class GraftFileIndex(
    spark: SparkSession,
    meta: TableMeta,
    files: Seq[DataFileMeta]) extends FileIndex {

  private val hadoopConf = new Configuration(spark.sparkContext.hadoopConfiguration)

  private lazy val statuses: Map[String, FileStatus] = files.map { f =>
    val p = new Path(f.path)
    f.path -> p.getFileSystem(hadoopConf).getFileStatus(p)
  }.toMap

  override def rootPaths: Seq[Path] = files.map(f => new Path(f.path))

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    // logical column names == physical here (the index is only used for
    // single-generation base filesets; see GraftTable.scanIndexed)
    val translated = dataFilters.flatMap(GraftSqlBridge.translateFilter)
    val keep = PartitionPruner.pruneFiles(meta, files, translated)
    Seq(PartitionDirectory(InternalRow.empty, keep.map(f => statuses(f.path)).toArray))
  }

  override def inputFiles: Array[String] = files.map(_.path).toArray
  override def refresh(): Unit = ()
  override def sizeInBytes: Long = statuses.values.map(_.getLen).sum max 1L
  override def partitionSchema: StructType = StructType(Nil)
}
