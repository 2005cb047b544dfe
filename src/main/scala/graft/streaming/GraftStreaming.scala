package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.Row

import graft.table.GraftTable

/**
 * Streaming surface of the engine — the Spark-native analog of the
 * reference's streaming pieces:
 *
 *  - [[upsertSink]]: at-least-once upsert sink, one delta commit per
 *    micro-batch (reference: KuduSink, kudu-spark DefaultSource.scala:538-555;
 *    W8 in SURVEY.md §2.3). Exactly mirrors the connector's default
 *    operation (upsert, DefaultSource.scala:270-272).
 *  - [[changeStream]]: an incremental change-log source that streams delta
 *    commits as they land (reference: diff scans feeding incremental backup,
 *    KuduBackupRDD.scala:78-80; replication java/kudu-replication). Each row
 *    carries the row image plus `_op` (U|D) and `_seq` (commit version).
 */
object GraftStreaming {

  /** Attach an upsert-per-micro-batch sink to a streaming DataFrame. The
    * caller starts/stops the returned writer. */
  def upsertSink(stream: DataFrame, table: GraftTable): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("update")
      .foreachBatch((batch: DataFrame, _: Long) => table.upsert(batch))

  /** Convenience: start the sink immediately. */
  def startUpsertSink(stream: DataFrame, table: GraftTable): StreamingQuery =
    upsertSink(stream, table).start()

  /**
   * Change-log stream of a graft table: a file stream over the table's delta
   * commit directories. New mutation commits (upsert/update/delete/insert
   * deltas) appear as new files and are emitted incrementally — the
   * streaming equivalent of repeated diff scans. Base-only commits
   * (initial load, compaction) do not re-emit rows, matching diff-scan
   * semantics (logical changes only).
   *
   * Schema: all physical table columns (nullable) + `_graft_op` + `_graft_seq`.
   */
  /**
   * Continuous replication (E6, java/kudu-replication): tails the source's
   * change stream and applies each micro-batch op-aware to the destination —
   * upserts replayed as upserts, delete tombstones as ignore-deletes.
   * At-least-once; both ops are idempotent per (PK, row image), so replays
   * converge.
   */
  def startReplication(spark: SparkSession, src: GraftTable, dest: GraftTable): StreamingQuery = {
    val m = src.meta
    changeStream(spark, src).writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // physical → logical names for the destination API
        val logical = batch.select(
          m.columns.map(c => batch(c.physName).as(c.name)) :+ batch(GraftTable.OpCol): _*)
        val ups = logical.filter(logical(GraftTable.OpCol) === GraftTable.OpUpsert)
          .drop(GraftTable.OpCol)
        val dels = logical.filter(logical(GraftTable.OpCol) === GraftTable.OpDelete)
          .select(m.keyCols.map(logical(_)): _*)
        if (!ups.isEmpty) dest.upsert(ups)
        if (!dels.isEmpty) dest.delete(dels, ignore = true)
      }
      .start()
  }

  def changeStream(spark: SparkSession, table: GraftTable): DataFrame = {
    val m = table.meta
    val fields = m.columns.map(c =>
      StructField(c.physName, c.dataType, nullable = true)) ++ Seq(
      StructField(GraftTable.OpCol, StringType, nullable = false),
      StructField(GraftTable.SeqCol, LongType, nullable = false))
    spark.readStream
      .schema(StructType(fields))
      .option("maxFilesPerTrigger", "64")
      // delta dirs carry a per-commit-attempt unique suffix. The glob must
      // match only original c<v>_delta_<id> filesets, NOT c<v>_deltamerge_<id>
      // compaction outputs — a minor fold rewrites latest-per-key rows and
      // would otherwise re-emit the entire delta set into the change stream.
      .parquet(s"${table.location}/data/c*_delta_*")
  }
}
