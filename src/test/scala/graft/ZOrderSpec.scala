package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._
import org.scalatest.funsuite.AnyFunSuite

import graft.table.GraftTable

/** Z-order clustered rewrites (GraftTable.cluster + CALL system.cluster):
  * file assignment by the Morton interleave of quantile-binned columns, so
  * the per-file zone maps become selective on EVERY cluster column at once
  * — the layout a multi-column non-key filter wants at 100 TB. */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  /** PK k; (a, b) independent dimensions both scattered vs k. */
  private def mkTable(n: Int = 4096): GraftTable = {
    val data = (1 to n).map { k =>
      (k.toLong, ((k * 2654435761L) % 10000L + 10000L) % 10000L,
        ((k * 40503L) % 10000L + 10000L) % 10000L, s"p$k")
    }.toDF("k", "a", "b", "payload")
    GraftTable.create(spark, tmp("graft-zo-"), "zo", data.schema, Seq("k"),
      data = Some(data))
  }

  test("cluster rewrites into z-assigned files with selective zone maps") {
    val t = mkTable()
    val before = t.scan().orderBy("k").collect().toSeq
    t.cluster(Seq("a", "b"), nFiles = 16)
    val m = t.meta
    assert(m.operation == "cluster" && m.deltaFiles.isEmpty)
    assert(m.baseFiles.length == 16)
    // exact row preservation through the rewrite
    assert(t.scan().orderBy("k").collect().toSeq == before)
    // zone selectivity: an equality on EACH clustered dimension must prune
    // most files (16 files ≈ 4 z-bits ≈ 4 half-splits alternating a/b)
    def kept(fs: Filter*) =
      graft.sources.PartitionPruner.pruneFiles(m, m.baseFiles, fs).length
    assert(kept(EqualTo("a", 1234L)) <= 8, s"a-eq kept ${kept(EqualTo("a", 1234L))}")
    assert(kept(EqualTo("b", 1234L)) <= 8, s"b-eq kept ${kept(EqualTo("b", 1234L))}")
    val both = kept(EqualTo("a", 1234L), EqualTo("b", 9876L))
    assert(both <= 4, s"a+b kept $both of 16")
    // a 2-D range box prunes too, and the pruned scan stays exact
    val boxKept = kept(GreaterThanOrEqual("a", 1000L), LessThan("a", 2000L),
      GreaterThanOrEqual("b", 5000L), LessThan("b", 6000L))
    assert(boxKept < 16, s"box kept $boxKept")
    val cond = col("a") >= 1000L && col("a") < 2000L &&
      col("b") >= 5000L && col("b") < 6000L
    val pruned = t.scanPruned(Seq(GreaterThanOrEqual("a", 1000L),
      LessThan("a", 2000L), GreaterThanOrEqual("b", 5000L), LessThan("b", 6000L)))
      .filter(cond).select("k").as[Long].collect().toSeq.sorted
    val full = t.scan().filter(cond).select("k").as[Long].collect().toSeq.sorted
    assert(pruned == full && full.nonEmpty)
  }

  test("cluster folds deltas and keeps merge-on-read exact afterwards") {
    val t = mkTable(1000)
    t.upsert(Seq((5L, 1L, 2L, "new5")).toDF("k", "a", "b", "payload"))
    t.delete(Seq(6L).toDF("k"))
    val before = t.scan().orderBy("k").collect().toSeq
    t.cluster(Seq("a", "b"), nFiles = 4)
    assert(t.meta.deltaFiles.isEmpty)
    assert(t.scan().orderBy("k").collect().toSeq == before)
    // mutations after the clustered rewrite ride the normal MOR path
    t.upsert(Seq((7L, 3L, 4L, "new7")).toDF("k", "a", "b", "payload"))
    assert(t.scan().filter(col("k") === 7L).select("payload")
      .as[String].head() == "new7")
  }

  test("cluster preserves hash-partition coordinates") {
    val data = (1 to 2000).map(k =>
      (k.toLong, (k * 37L) % 500L, (k * 91L) % 500L)).toDF("k", "a", "b")
    val t = GraftTable.create(spark, tmp("graft-zoh-"), "zoh", data.schema,
      Seq("k"), Seq(graft.catalog.HashComponent(Seq("k"), 4)), data = Some(data))
    t.cluster(Seq("a", "b"), nFiles = 16)
    val m = t.meta
    assert(m.baseFiles.forall(_.bucket.isDefined))
    assert(m.baseFiles.map(_.bucket.get).distinct.sorted == Seq(0, 1, 2, 3))
    // bucket pruning still composes with zone pruning
    val one = t.scanPruned(Seq(EqualTo("k", 42L)))
    assert(one.filter(col("k") === 42L).count() == 1)
    val zoneKept = graft.sources.PartitionPruner.pruneFiles(
      m, m.baseFiles, Seq(EqualTo("a", 123L))).length
    assert(zoneKept < m.baseFiles.length)
  }

  test("compaction preserves the persisted clustering; uncluster clears it") {
    val t = mkTable(2048)
    t.cluster(Seq("a", "b"), nFiles = 8)
    assert(t.meta.clusterBy.isDefined)
    // mutations then a PLAIN compact: the rewrite must stay clustered —
    // background maintenance cannot silently de-cluster the table
    t.upsert(Seq((1L, 9999L, 9999L, "x")).toDF("k", "a", "b", "payload"))
    t.delete(Seq(2L).toDF("k"))
    val before = t.scan().orderBy("k").collect().toSeq
    t.compact()
    val m = t.meta
    assert(m.operation == "compact" && m.clusterBy.isDefined)
    // the operator's chosen file count survives re-clustering: a compact
    // must not balloon the 8-file layout to spark.sql.shuffle.partitions
    assert(m.baseFiles.length == 8, s"files=${m.baseFiles.length}")
    assert(t.scan().orderBy("k").collect().toSeq == before)
    def kept(fs: org.apache.spark.sql.sources.Filter*) =
      graft.sources.PartitionPruner.pruneFiles(m, m.baseFiles, fs).length
    // range-sampler boundary noise varies with suite state (AQE shapes the
    // MOR child the boundaries are sampled from): measured 4-5 of 8 — the
    // gate is "still clustered", i.e. clearly below the unclustered 8
    assert(kept(EqualTo("a", 1234L)) <= 6,
      s"post-compact kept ${kept(EqualTo("a", 1234L))} of ${m.baseFiles.length}")
    // per-tablet fold honors it too (hash table → compactTablet path)
    val d2 = (1 to 1024).map(k => (k.toLong, (k * 7L) % 997L, (k * 13L) % 997L))
      .toDF("k", "a", "b")
    val th = GraftTable.create(spark, tmp("graft-zoc-"), "zoc", d2.schema,
      Seq("k"), Seq(graft.catalog.HashComponent(Seq("k"), 2)), data = Some(d2))
    th.cluster(Seq("a", "b"), nFiles = 8)
    th.upsert(Seq((3L, 1L, 1L)).toDF("k", "a", "b"))
    th.compactTablet(bucket = Some(th.locateRow(Map("k" -> "3"))._1.get))
    assert(th.meta.clusterBy.isDefined)
    // one tablet's fold writes its SHARE of the clustered count (8/2
    // buckets = 4), not the whole-table count per fold
    assert(th.meta.baseFiles.length <= 8,
      s"tablet fold ballooned to ${th.meta.baseFiles.length} files")
    assert(th.scan().filter(col("k") === 3L).select("a").as[Long].head() == 1L)
    // uncluster: plain PK-sorted rewrite, spec cleared, later compacts stay plain
    t.uncluster()
    assert(t.meta.clusterBy.isEmpty && t.meta.operation == "uncluster")
    assert(t.scan().orderBy("k").collect().toSeq == before)
    // a dropped clusterBy column degrades compact() to plain (no throw)
    val td = mkTable(300)
    td.cluster(Seq("a", "b"), nFiles = 2)
    td.dropColumn("b")
    td.compact() // ids no longer resolve to 2 clusterable columns → plain
    assert(td.meta.operation == "compact")
  }

  test("string columns cluster through the 8-byte prefix derivation") {
    val data = (1 to 2000).map { k =>
      // host ~ 50 distinct prefixes, ts-ish long; both scattered vs PK
      (k.toLong, f"host-${(k * 7919) % 50}%02d.example", (k * 2654435761L) % 100000L)
    }.toDF("k", "host", "t")
    val t = GraftTable.create(spark, tmp("graft-zos-"), "zos", data.schema,
      Seq("k"), data = Some(data))
    val before = t.scan().orderBy("k").collect().toSeq
    t.cluster(Seq("host", "t"), nFiles = 8)
    assert(t.scan().orderBy("k").collect().toSeq == before)
    val m = t.meta
    def kept(fs: org.apache.spark.sql.sources.Filter*) =
      graft.sources.PartitionPruner.pruneFiles(m, m.baseFiles, fs).length
    // 8 files = 3 interleave bits → host owns ~1 of the top bits; range-
    // sampler boundary noise blurs the halves, so ≤6 of 8 is the stable
    // bound (measured 5)
    assert(kept(EqualTo("host", "host-07.example")) <= 6,
      s"host-eq kept ${kept(EqualTo("host", "host-07.example"))} of ${m.baseFiles.length}")
    assert(kept(StringStartsWith("host", "host-4")) < m.baseFiles.length)
    // short-vs-long ordering holds through the encoded domain
    // ("b" must bin above "aa", not below — hex pairs preserve byte order)
    import graft.table.GraftTable.encodeKeyExpr
    import org.apache.spark.sql.types.StringType
    val r = spark.range(1).select(
      encodeKeyExpr(StringType, lit("aa")).get.as("aa"),
      encodeKeyExpr(StringType, lit("b")).get.as("b")).collect().head
    assert(r.getString(1) > r.getString(0))
  }

  test("CALL system.zone_stats reports decoded per-file bounds") {
    val t = mkTable(800)
    t.cluster(Seq("a", "b"), nFiles = 4)
    val f = new java.io.File(t.location)
    spark.conf.set("spark.sql.catalog.gzs",
      classOf[graft.sources.v2.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gzs.warehouse", f.getParent)
    val rows = spark.sql(
      s"CALL gzs.system.zone_stats('${f.getName}', 'a')").collect()
    assert(rows.length == 4)
    assert(rows.map(_.getLong(1)).sum == 800L)
    // decoded longs, non-overlap is NOT required (z interleaves two dims)
    // but bounds must be present and ordered within each file
    rows.foreach { r =>
      val (lo, hi) = (r.getString(2).toLong, r.getString(3).toLong)
      assert(lo <= hi && r.getLong(4) == 0L)
    }
    // the lead key reports through the keyLo/keyHi fallback too
    val krows = spark.sql(
      s"CALL gzs.system.zone_stats('${f.getName}', 'k')").collect()
    assert(krows.forall(r => r.getString(2) != null))
  }

  test("cluster columns past the zone-map cap still record bounds") {
    // 40 payload columns with cap 4: the cluster columns sit at the END of
    // the schema and would fall outside the cap — boundsColumns must
    // prioritize them or the clustering records no prunable bounds at all
    spark.conf.set("graft.bounds.maxColumns", "4")
    try {
      val base = (1 to 500).map(k => k.toLong).toDF("k")
      val wide = (1 to 40).foldLeft(base)((df, i) =>
        df.withColumn(s"c$i", col("k") * i))
        .withColumn("za", col("k") % 100L).withColumn("zb", col("k") % 7L)
      val t = GraftTable.create(spark, tmp("graft-zow-"), "zow", wide.schema,
        Seq("k"), data = Some(wide))
      t.cluster(Seq("za", "zb"), nFiles = 4)
      val m = t.meta
      val zaId = m.column("za").id
      assert(m.baseFiles.forall(_.colBounds(zaId).isDefined),
        "cluster column must carry zone maps despite the cap")
      // and a non-priority payload column is capped out, proving the cap bites
      val c40 = m.column("c40").id
      assert(m.baseFiles.forall(_.colBounds(c40).isEmpty))
      val kept = graft.sources.PartitionPruner.pruneFiles(m, m.baseFiles,
        Seq(LessThan("za", 25L))).length
      assert(kept < m.baseFiles.length, s"kept $kept of ${m.baseFiles.length}")
    } finally spark.conf.unset("graft.bounds.maxColumns")
  }

  test("CALL system.cluster and input validation") {
    val t = mkTable(500)
    val f = new java.io.File(t.location)
    spark.conf.set("spark.sql.catalog.gzo",
      classOf[graft.sources.v2.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gzo.warehouse", f.getParent)
    val v = spark.sql(
      s"CALL gzo.system.cluster('${f.getName}', 'a,b', files => 4)")
      .collect().head.getLong(0)
    assert(v == t.currentVersion && t.meta.operation == "cluster")
    assert(t.meta.baseFiles.length == 4)
    // empty column list = CALL-face uncluster
    spark.sql(s"CALL gzo.system.cluster('${f.getName}', '')").collect()
    assert(t.meta.clusterBy.isEmpty && t.meta.operation == "uncluster")
    intercept[IllegalArgumentException] { t.cluster(Seq("a")) }
    intercept[IllegalArgumentException] { t.cluster(Seq("a", "a")) }
    intercept[IllegalArgumentException] { t.cluster(Seq("a", "nope")) }
  }
}
