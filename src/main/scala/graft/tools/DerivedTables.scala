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

  /** Source-side back-pointer registry: a source table carries one marker
    * file per derived table built FROM it, under `<location>/_derived/`.
    * The derived table holds the forward pointer (its SrcLocKey +
    * watermark); the source's back-pointer is what lets history GC floor
    * its expiry at the watermarks still needed ([[graft.table.GraftTable]]
    * `expireVersions`) — without it, aggressive retention plus one missed
    * refresh tick forces a full O(derived) rebuild. Markers are FILES, not
    * table properties: a registration must not commit a version on the
    * source (builds against long-lived shared tables would bloat their
    * version chains and invalidate their fingerprints), and the GC that
    * reads markers deletes dead ones lazily. */
  private val RegDir = "_derived"

  private def regFile(sourceLoc: String, derivedLoc: String): java.nio.file.Path =
    java.nio.file.Paths.get(sourceLoc, RegDir,
      java.net.URLEncoder.encode(derivedLoc, "UTF-8"))

  /** Record `derivedLoc` as a derived table of `source` (idempotent). The
    * marker also records the source version current AT REGISTRATION: until
    * the build commits its watermark property, the derived table cannot
    * answer [[watermarkFor]], and a long build racing an aggressive
    * retention tick would otherwise lose the very version it is about to
    * record — the GC honors this recorded floor while the marker is
    * younger than the tick's own age grace (see GraftTable.expireVersions). */
  private[graft] def register(source: GraftTable, derivedLoc: String): Unit = {
    val f = regFile(source.location, derivedLoc)
    java.nio.file.Files.createDirectories(f.getParent)
    java.nio.file.Files.write(f,
      s"$derivedLoc\n${source.meta.version}".getBytes("UTF-8"))
  }

  /** The floor version recorded in the marker at registration time (absent
    * for markers written before this field existed). */
  private[graft] def markerFloor(sourceLoc: String,
      derivedLoc: String): Option[(Long, Long)] = {
    val f = regFile(sourceLoc, derivedLoc)
    if (!java.nio.file.Files.exists(f)) return None
    val lines = new String(java.nio.file.Files.readAllBytes(f), "UTF-8")
      .split("\n")
    for {
      v <- lines.lift(1).flatMap(s => scala.util.Try(s.trim.toLong).toOption)
      mtime <- scala.util.Try(
        java.nio.file.Files.getLastModifiedTime(f).toMillis).toOption
    } yield (v, mtime)
  }

  /** The derived-table locations registered beside `sourceLoc`. */
  private[graft] def registered(sourceLoc: String): Seq[String] = {
    val dir = java.nio.file.Paths.get(sourceLoc, RegDir)
    if (!java.nio.file.Files.isDirectory(dir)) return Nil
    import scala.jdk.CollectionConverters._
    scala.util.Using.resource(java.nio.file.Files.list(dir)) { s =>
      s.iterator().asScala
        .map(p => java.net.URLDecoder.decode(p.getFileName.toString, "UTF-8"))
        .toSeq
    }
  }

  /** Remove a dead registration (derived table dropped or re-pointed). */
  private[graft] def deregister(sourceLoc: String, derivedLoc: String): Unit =
    java.nio.file.Files.deleteIfExists(regFile(sourceLoc, derivedLoc))

  /** The source-version watermark `derivedLoc` still needs, IF it exists
    * and its forward pointer names `sourceLoc` (a dropped derived table, or
    * one rebuilt against another source, yields None — the caller should
    * also clear the dead registration). */
  private[graft] def watermarkFor(derivedLoc: String,
      sourceLoc: String): Option[Long] = {
    if (!graft.catalog.TableMeta.exists(derivedLoc)) return None
    val p = graft.catalog.TableMeta.readCurrent(derivedLoc).propsMap
    val fwd = p.get(MaterializedRollup.SrcLocKey)
      .orElse(p.get(SecondaryIndex.SrcLocKey))
      .orElse(p.get(VectorIndex.SrcLocKey))
    if (!fwd.contains(sourceLoc)) return None
    p.get(MaterializedRollup.SrcVersionKey)
      .orElse(p.get(SecondaryIndex.SrcVersionKey))
      .orElse(p.get(VectorIndex.SrcVersionKey))
      .flatMap(v => scala.util.Try(v.toLong).toOption)
  }

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
