package graft.tools

import org.apache.spark.sql.SparkSession

import graft.table.GraftTable

/**
 * Maintenance hook for CDC-maintained DERIVED tables — materialized
 * rollups, secondary indexes, vector indexes. Each records its source
 * location and a source-version watermark in table properties; this probes
 * those properties and runs the matching incremental refresh when the
 * source moved past the watermark. The reference's MaintenanceManager
 * covers every tablet's upkeep unconditionally in the background
 * (util/maintenance_manager.cc:736); a derived table whose refresh only
 * runs when an operator remembers to CALL it is the same gap the delta
 * backstop closed for base tables — so [[graft.table.MaintenanceScheduler]]
 * ticks call this per table, and warehouse ticks sweep it across every
 * table under the directory.
 */
object DerivedTables {

  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Per-location refresh mutex. Two concurrent refreshes of ONE derived
    * table (an explicit call racing a background tick, or a per-table tick
    * racing the warehouse sweep) could commit their data in one order and
    * write their watermarks in the other — leaving the table marked
    * CURRENT while rows recomputed against the earlier snapshot overwrote
    * the newer ones (stale-but-current, the one state a refresh-or-miss
    * serving layer must never reach). Every refresh path serializes on
    * this per-location monitor; single-driver posture, same as the
    * scheduler registry. Never nests: a chained rollup's refresh only
    * SCANS its source, it never refreshes it. */
  private[graft] def lockFor(location: String): Object =
    locks.computeIfAbsent(location, _ => new Object)

  /** Whether `t`'s properties mark it as a maintained derived table. */
  def isDerived(t: GraftTable): Boolean = {
    val p = t.properties
    p.contains(MaterializedRollup.SrcLocKey) ||
      p.contains(SecondaryIndex.SrcLocKey) ||
      p.contains(VectorIndex.SrcLocKey)
  }

  /** Refresh `t` if it is a derived table whose source version moved past
    * the recorded watermark. Returns true when a refresh ran (a current
    * derived table, or a plain table, returns false). Throws what the
    * underlying refresh throws — e.g. a cleanly-worded history-expiry
    * error when the source GC'd past the watermark (rebuild is the only
    * remedy; the scheduler records it as the tick's lastError). */
  def refreshIfStale(spark: SparkSession, t: GraftTable): Boolean = {
    val p = t.properties
    if (p.contains(MaterializedRollup.SrcLocKey))
      MaterializedRollup.refresh(spark, t)
    else if (p.contains(SecondaryIndex.SrcLocKey))
      SecondaryIndex.refresh(spark, t)
    else if (p.contains(VectorIndex.SrcLocKey))
      VectorIndex.refresh(spark, t)
    else false
  }
}
