package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.table.GraftTable

/**
 * Shared commit primitive for incremental-refresh maintenance (rollup,
 * secondary index, vector index): fresh rows upsert, stale key rows
 * tombstone, as ONE atomic [[GraftTable.applyChanges]] commit.
 *
 * The refresh paths derive `stale` with a `left_anti` against `fresh`, so
 * the two sets are disjoint by construction — the transactional validation
 * probe (strict-delete presence, strict-insert absence) would be a pure
 * job-floor tax here. `applyChanges` keeps the in-write duplicate-key
 * guard (one action per key) and commits a single fileset under a single
 * version, which is exactly the W9 atomicity the refresh contract needs.
 */
private[tools] object RefreshCommit {

  /** `staleKeys` may carry any subset of the table's columns as long as
    * the primary key is present; missing columns null-fill (tombstones
    * carry keys only). `watermark` (the refresh's new source-version
    * properties) commits ATOMICALLY with the rows — a crash can never
    * leave the derived table's data and its watermark disagreeing (the
    * before-image refresh paths derive state from `source@watermark`, so
    * a torn pair would corrupt the next refresh, not just mislabel). */
  def apply(t: GraftTable, fresh: DataFrame, staleKeys: DataFrame,
      watermark: Map[String, Option[String]] = Map.empty,
      sizeHintBytes: Option[Long] = None): Unit = {
    val cols = t.meta.visibleColumns
    val have = staleKeys.columns.toSet
    val staleFull = staleKeys.select(cols.map { c =>
      if (have(c.name)) col(c.name).cast(c.dataType).as(c.name)
      else lit(null).cast(c.dataType).as(c.name)
    }: _*)
    val freshFull = fresh.select(cols.map(c =>
      col(c.name).cast(c.dataType).as(c.name)): _*)
    t.applyChanges(
      freshFull.withColumn(GraftTable.DeletedCol, lit(false))
        .unionByName(staleFull.withColumn(GraftTable.DeletedCol, lit(true))),
      propsUpdate = watermark, sizeHintBytes = sizeHintBytes)
  }
}
