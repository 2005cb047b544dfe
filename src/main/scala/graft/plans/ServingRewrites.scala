package graft.plans

import org.apache.spark.sql.SparkSession

import graft.table.GraftTable
import graft.tools.{MaterializedRollup, SecondaryIndex}

/**
 * One arming front door for the serving rewrites: a loaded table that is
 * a persisted ROLLUP arms [[RollupRewrite]], a persisted SECONDARY INDEX
 * arms [[IndexRewrite]] — with a single properties read shared across
 * both probes (properties cost a manifest read; the hot caller is
 * `GraftTable.load`). The already-armed short-circuits need no read at
 * all. This is what makes derived tables SERVE across sessions: build
 * arms the builder, and any later session re-arms on catalog open,
 * maintenance sweep, refresh call, or direct load.
 */
object ServingRewrites {

  /** ONE lock for every `spark.experimental.extraOptimizations`
    * read-append-write across the serving rewrites: RollupRewrite and
    * IndexRewrite arming concurrently (catalog open racing a build) under
    * separate monitors could interleave the read and the write, lose one
    * append, and silently disarm that rewrite for the session. The
    * per-rule registries keep their own monitors. */
  private[plans] val armLock = new Object

  /** Arm whatever rewrite `t`'s persisted properties call for; idempotent,
    * cheap when already armed. Returns whether `t` is an armed derived
    * table. */
  def autoArm(spark: SparkSession, t: GraftTable): Boolean = {
    if (RollupRewrite.isArmed(spark, t.location) ||
      IndexRewrite.isArmed(spark, t.location)) return true
    val p = try t.properties catch { case _: Exception => return false }
    if (p.contains(MaterializedRollup.SrcLocKey)) {
      if (!RollupRewrite.autoRewriteEnabled(spark)) return false
      RollupRewrite.enable(spark, t); true
    } else if (p.contains(SecondaryIndex.SrcLocKey)) {
      if (!IndexRewrite.autoRewriteEnabled(spark)) return false
      IndexRewrite.enable(spark, t); true
    } else false
  }

  /** Arm every persisted rollup/index under `warehouseDir` in `spark` —
    * the cross-session serving half of warehouse auto-maintenance.
    * Individual sick tables never stop the sweep. The walk is BOUNDED
    * (depth 4, 1024 tables): this runs synchronously on every catalog
    * open, and a warehouse mis-rooted at a shared directory (/tmp) must
    * not turn session start into a filesystem crawl — tables beyond the
    * cap still arm lazily on first load/refresh/build. */
  def armFromWarehouse(spark: SparkSession, warehouseDir: String): Int = {
    // never walk the system temp root: harness catalogs point their
    // warehouse at a table dir's PARENT (often /tmp itself), and arming
    // would crawl 1024 unrelated scratch tables on EVERY catalog open —
    // same refusal as MaintenanceScheduler.autoScheduleWarehouse. Derived
    // tables under such a catalog still arm on build/load/refresh.
    if (graft.tools.GraftTools.isTmpRoot(warehouseDir)) return 0
    val cap = 1024
    val (tables, depthPruned) = graft.tools.GraftTools
      .listWarehouseTablesEx(java.nio.file.Paths.get(warehouseDir),
        includeHidden = true, // SQL faces park derived tables in dot-dirs
        maxDepth = 4, maxTables = cap)
    if (tables.size >= cap)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"armFromWarehouse($warehouseDir) hit the $cap-table walk cap; " +
          "remaining derived tables arm lazily on first load")
    if (depthPruned)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"armFromWarehouse($warehouseDir) pruned directories deeper than " +
          "4 levels; derived tables nested below arm lazily on first load")
    tables.count { p =>
      try autoArm(spark, GraftTable.load(spark, p.toString))
      catch { case _: Exception => false }
    }
  }
}
