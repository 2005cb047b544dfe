package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.tagobjects.Slow

/**
 * The MOR ladder at millions of rows (graft.tools.ScaleSmoke): bulk load →
 * 1% upsert → 0.5% delete → merge-on-read scan → per-tablet compaction →
 * metadata-only COUNT → Z-cluster → zone-pruned TOP-N → runtime-filter
 * star-join A/B. The runner itself `require`s the exactness and pruning
 * shapes (counts exact through the overlay, COUNT served from metadata,
 * TOP-N and runtime filter both pruning ≥ half the clustered files) — the
 * spec drives it at a volume an order of magnitude past the sf0.1
 * fixtures and asserts the remaining shape facts. The bench runs the same
 * ladder at 20M+ rows into the bench.json "scale" sidecar block.
 */
class ScaleSmokeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("MOR ladder holds its shape at millions of rows", Slow) {
    val rows = sys.env.getOrElse("SPARK_GRAFT_SCALE_SPEC_ROWS", "4000000").toLong
    val r = graft.tools.ScaleSmoke.run(spark, rows)
    val steps = r.steps.toMap
    val stats = r.stats.toMap
    // every ladder rung ran
    Seq("load", "upsert_1pct", "delete_half_pct", "mor_scan",
      "mor_filter_scan", "mor_spill_scan", "compact_policy",
      "metadata_count", "star_load_cluster", "topn_zone",
      "ab_star_rf_on", "ab_star_rf_off",
      "rollup_base_load", "rollup_build", "rollup_refresh_1grp",
      "sindex_build", "sindex_lookup", "sindex_refresh_1row",
      "sindex_rewrite_point")
      .foreach { s => assert(steps.contains(s), s"missing ladder step $s") }
    // incremental view maintenance: the scale observable at local[32] is
    // the I/O contract, NOT wall time — a full rebuild of a narrow
    // 256-group aggregate over page-cached files stays sub-second even at
    // 10M rows, while the refresh pays ~3 fixed job floors. The runner's
    // assertPrune is the binding gate (the 1-group recompute must open at
    // most half the base files); times land in the sidecar for the record.
    assert(stats("rollup_groups") == 256L)
    // the bulk load fanned across the hash buckets and the cluster rewrite
    // landed its file count
    assert(stats("base_files_loaded") >= 16L)
    assert(stats("clustered_files") >= 16L)
    // the dirty phase actually produced delta pressure for the overlay
    assert(stats("delta_files_dirty") > 0L)
    // metadata count is metadata-speed, not a scan (the runner asserts the
    // PLAN; this asserts the cost posture at scale)
    assert(steps("metadata_count") < math.max(1.0, steps("mor_scan")),
      s"metadata COUNT (${steps("metadata_count")}s) must undercut the " +
        s"merge-on-read scan (${steps("mor_scan")}s)")
    info(r.steps.map { case (n, s) => f"$n=$s%.2f" }.mkString(" "))
    info(r.stats.map { case (n, v) => s"$n=$v" }.mkString(" "))
  }
}
