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
    * Individual sick tables never stop the sweep. */
  def armFromWarehouse(spark: SparkSession, warehouseDir: String): Int =
    graft.tools.GraftTools
      .listWarehouseTables(java.nio.file.Paths.get(warehouseDir),
        includeHidden = true) // SQL faces park derived tables in dot-dirs
      .count { p =>
        try autoArm(spark, GraftTable.load(spark, p.toString))
        catch { case _: Exception => false }
      }
}
