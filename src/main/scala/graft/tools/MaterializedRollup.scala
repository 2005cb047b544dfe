package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.HashComponent
import graft.table.GraftTable

/**
 * CDC-maintained materialized rollup — incremental view maintenance for the
 * aggregate a serving layer reads constantly while the base table keeps
 * mutating. At 100 TB, recomputing `GROUP BY` aggregates from scratch on
 * every refresh is the dominant cost of any reporting pipeline; this module
 * keeps the rollup current with work proportional to the MUTATED GROUPS,
 * never the base table:
 *
 *   - `build` computes the full aggregate once and persists it as an engine
 *     table keyed by the group columns (hash-partitioned on them, so
 *     serving point-reads of single groups prunes to one bucket).
 *   - `refresh` reads ONLY the keys mutated since the recorded watermark
 *     (`changesSince` — the S11 delta-only fast path when no compaction
 *     intervened), derives the touched group set from them, recomputes
 *     exactly those groups from the current base snapshot, and commits the
 *     upserted groups + vanished-group tombstones as ONE atomic
 *     transaction (W9). When the touched set is small enough to collect,
 *     the recompute scan pushes an IN-list over the group columns, so a
 *     base clustered/range-partitioned on them opens only the touched
 *     tablets' files (S8/P4 pruning).
 *
 * The group columns must be PRIMARY KEY columns of the base: the CDC fast
 * path materializes tombstones from delete deltas, which carry key columns
 * only — a non-key grouping column is NULL on them, and the vanished
 * group could not be located. (This is also what makes the maintenance
 * well-defined: a PK group key can never mutate in place, so every group
 * move is an explicit delete+insert and both sides surface in the diff.)
 *
 * The aggregate definitions are SQL expression strings (persisted in the
 * rollup's table properties, so `refresh` replays them verbatim); any
 * deterministic Spark aggregate works because touched groups are
 * recomputed whole — no retraction algebra, so MIN/MAX/COUNT DISTINCT are
 * as maintainable as SUM.
 *
 * Reference anchors: diff scan S11 (client/client.h:3150), multi-row
 * transaction W9, PK-range/hash pruning S8/P4.
 */
object MaterializedRollup {

  val SrcLocKey = "graft.rollup.source"
  val GroupColsKey = "graft.rollup.groupCols"
  val AggsKey = "graft.rollup.aggs"
  val SrcVersionKey = "graft.rollup.sourceVersion"

  private[graft] val FieldSep = "\u001f" // within one agg: alias US expr
  private[graft] val RecSep = "\u001e"   // between aggs

  private def aggExprs(aggs: Seq[(String, String)]) =
    aggs.map { case (alias, e) => expr(e).as(alias) }

  private def grouped(base: DataFrame, groupCols: Seq[String],
      aggs: Seq[(String, String)]): DataFrame = {
    val es = aggExprs(aggs)
    base.groupBy(groupCols.map(col): _*).agg(es.head, es.tail: _*)
  }

  /**
   * Build the rollup beside `source`. `aggs` is (alias, aggregate SQL
   * expression), e.g. `("sum_price", "sum(CAST(o_totalprice AS
   * DECIMAL(28,2)))")`. The rollup table is keyed by `groupCols` and
   * hash-partitioned on them across `buckets`.
   */
  def build(spark: SparkSession, source: GraftTable, groupCols: Seq[String],
      aggs: Seq[(String, String)], location: String,
      buckets: Int = 16): GraftTable = {
    // back-pointer first (a marker file, no commit): from this moment the
    // source's history GC floors its expiry at this rollup's watermark —
    // see DerivedTables.register
    DerivedTables.register(source, location)
    val m = source.meta
    require(groupCols.nonEmpty, "at least one group column required")
    require(aggs.nonEmpty, "at least one aggregate required")
    val pk = m.keyCols.toSet
    groupCols.foreach(c => require(pk.contains(c),
      s"rollup group column $c must be a primary-key column of ${m.name} " +
        s"(PK: ${m.keyCols.mkString(", ")}) — CDC tombstones carry keys only"))
    val badAlias = aggs.map(_._1).find(a =>
      groupCols.contains(a) || a.contains(FieldSep) || a.contains(RecSep))
    require(badAlias.isEmpty, s"bad aggregate alias: ${badAlias.getOrElse("")}")
    val srcVersion = m.version
    // pinned to the watermark version: an unpinned scan could read a later
    // commit than the recorded watermark (see SecondaryIndex.build)
    val df = grouped(source.scan(Some(srcVersion)), groupCols, aggs)
    val rollup = GraftTable.create(spark, location, s"${m.name}_rollup",
      df.schema, groupCols,
      hash = Seq(HashComponent(groupCols, buckets)),
      data = Some(df))
    rollup.setProperties(Map(
      SrcLocKey -> Some(m.location),
      GroupColsKey -> Some(groupCols.mkString(FieldSep)),
      AggsKey -> Some(aggs.map { case (a, e) => a + FieldSep + e }
        .mkString(RecSep)),
      SrcVersionKey -> Some(srcVersion.toString)))
    // marker re-write after the watermark commit: an expiry tick outlasting
    // the build grace mid-build deregisters the marker; re-registering here
    // restores the GC floor for the finished rollup
    DerivedTables.register(source, location)
    // a materialized view's whole point is transparent serving: arm the
    // query rewrite by default (exact-only and freshness-gated, so it can
    // never change results — see plans/RollupRewrite). Same ambient-wiring
    // posture as graft.maintain.auto; opt out per session by setting
    // graft.rollup.autoRewrite to anything but "true" (lenient parse — a
    // value like "off" disables, it doesn't throw out of build).
    graft.plans.RollupRewrite.autoArm(spark, rollup)
    rollup
  }

  /**
   * Incremental refresh: recompute exactly the groups the source's change
   * stream touched since the recorded watermark, commit as one atomic
   * transaction (fresh group rows upserted, vanished groups deleted), and
   * advance the watermark. O(touched groups), never O(base). Returns false
   * when the rollup is already current.
   *
   * When the touched group-key set has at most `maxPruneKeys` rows it is
   * collected and pushed as an IN-list into the base scan, so a base
   * laid out on the group columns prunes untouched tablets at the manifest
   * level; larger sets fall back to a distributed semi-join (correct on
   * any size, no driver risk). `assertPrune = true` turns the pruning into
   * a hard gate: the IN-list path must run and keep at most half the base
   * files (test/verification hook, not for production use).
   *
   * If the source's history GC expired the watermark version, the change
   * read errors cleanly — rebuild with [[build]].
   */
  def refresh(spark: SparkSession, rollup: GraftTable,
      maxPruneKeys: Int = 4096, assertPrune: Boolean = false): Boolean =
      DerivedTables.lockFor(rollup.location).synchronized {
    val p = rollup.properties
    val src = GraftTable.load(spark, p(SrcLocKey))
    val v0 = p(SrcVersionKey).toLong
    val v1 = src.meta.version
    if (v1 == v0) return false
    // tiny CDC window → one static plan per action (see
    // SecondaryIndex.refresh: same explicit-exchange posture)
    val winBytes = src.cdcWindowBytes(v0, v1)
    GraftTable.withStaticPlan(spark,
      winBytes.exists(_ <= GraftTable.staticPlanMaxBytes)) {
      refreshImpl(spark, rollup, src, v0, v1, maxPruneKeys, assertPrune,
        winBytes)
    }
  }

  private def refreshImpl(spark: SparkSession, rollup: GraftTable,
      src: GraftTable, v0: Long, v1: Long,
      maxPruneKeys: Int, assertPrune: Boolean,
      winBytes: Option[Long]): Boolean = {
    val p = rollup.properties
    val groupCols = p(GroupColsKey).split(FieldSep).toSeq
    val aggs = p(AggsKey).split(RecSep).toSeq.map { r =>
      val i = r.indexOf(FieldSep)
      (r.substring(0, i), r.substring(i + 1))
    }
    // distinct touched group keys — tiny in steady state (bounded by the
    // mutation count, then by group cardinality). touchedKeys reads only
    // the delta files in range: no per-key fold, no v1 snapshot scan —
    // ghost/superseded keys recompute to the same result below. The
    // common small window drives everything from the ONE bounded collect;
    // only the over-bound fallback (a second pass over the CDC subtree)
    // pays a persist.
    val touched0 = src.touchedKeys(v0, v1, groupCols)
    // manifest-big (or unknown-size) window → persist BEFORE the bounded
    // probe so the over-bound fallback reuses the materialized partitions
    // (see SecondaryIndex.refresh)
    val winBig = winBytes.forall(_ > GraftTable.staticPlanMaxBytes)
    val touched =
      if (winBig) touched0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else touched0
    var persisted: Option[DataFrame] = if (winBig) Some(touched) else None
    try {
      val rows = touched.limit(maxPruneKeys + 1).collect()
      if (rows.isEmpty) {
        // version moved with no logical row change (e.g. a compaction):
        // just advance the watermark
        rollup.setProperties(Map(SrcVersionKey -> Some(v1.toString)))
        return true
      }
      val (base, keys) =
        if (rows.length <= maxPruneKeys) {
          // IN-list per group column: exact for one column, a pruning
          // superset for several — the semi-join below is always the
          // exact restriction either way
          val filters: Seq[org.apache.spark.sql.sources.Filter] =
            groupCols.zipWithIndex.map { case (c, i) =>
              org.apache.spark.sql.sources.In(c,
                rows.map(_.get(i)).distinct.toArray)
            }
          if (assertPrune) {
            val kept = graft.sources.PartitionPruner.pruneFiles(
              src.meta, src.meta.baseFiles, filters)
            val total = src.meta.baseFiles.length
            if (kept.length * 2 > total)
              throw new IllegalStateException(
                s"rollup refresh must prune the base scan: kept " +
                  s"${kept.length} of $total files for ${rows.length} " +
                  "touched groups")
          }
          // LocalRelation (exact tiny stats) — see SecondaryIndex.refresh
          val local = {
            import scala.jdk.CollectionConverters._
            spark.createDataFrame(rows.toSeq.asJava,
              org.apache.spark.sql.types.StructType(
                touched.schema.fields.map(_.copy(nullable = true))))
          }
          (src.scanPruned(filters), broadcast(local))
        } else {
          if (assertPrune) throw new IllegalStateException(
            s"rollup refresh fell back to the semi-join path " +
              s"(> $maxPruneKeys touched groups)")
          val p = if (winBig) touched else touched.persist(
            org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          persisted = Some(p)
          (src.scan(), p.toDF(groupCols: _*))
        }
      val freshRaw = grouped(base.join(keys, groupCols, "left_semi"),
        groupCols, aggs)
      // conform to the rollup's persisted column types (an agg's natural
      // result type can widen — e.g. sum(DECIMAL(28,2)) is DECIMAL(38,2))
      val fresh = freshRaw.select(rollup.meta.visibleColumns.map(c =>
        col(c.name).cast(c.dataType).as(c.name)): _*)
      // groups whose recompute came back empty vanished from the base.
      // In the small path fresh is bounded by the touched-group count but
      // its optimizer estimate flows through a join + aggregate —
      // broadcast it explicitly so a static plan never turns this into a
      // session-width sort-merge join; the over-bound path (backfill)
      // must NOT broadcast (fresh can be group-cardinality huge)
      val freshKeys = fresh.select(groupCols.map(col): _*)
      val stale = rollup.scan().select(groupCols.map(col): _*)
        .join(keys, groupCols, "left_semi")
        .join(if (rows.length <= maxPruneKeys) broadcast(freshKeys)
              else freshKeys,
          groupCols, "left_anti")
      // the watermark rides the SAME atomic commit as the rows
      RefreshCommit(rollup, fresh, stale,
        watermark = Map(SrcVersionKey -> Some(v1.toString)),
        // one row per touched group (plus the stale keys) — bounded by
        // the window itself; manifest-derived size for the commit's
        // guard-window exchange
        sizeHintBytes = winBytes.map(b => b * 2 + 1024))
      true
    } finally persisted.foreach(_.unpersist(blocking = false))
  }
}
