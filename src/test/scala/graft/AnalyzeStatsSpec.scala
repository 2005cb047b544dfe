package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.HashComponent
import graft.table.GraftTable

/**
 * ANALYZE → per-column statistics → Spark CBO. `GraftTable.analyze()` runs
 * one aggregate job over the snapshot and commits per-column NDV / null
 * count / min/max / string lengths to the manifest; the V2 scan reports
 * them via `SupportsReportStatistics.columnStats`, which Catalyst folds
 * into the relation's attribute stats (join sizing, filter selectivity).
 */
class AnalyzeStatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("analyze records exact nulls/min/max and sane NDV; scan reports them") {
    val wh = Files.createTempDirectory("graft-an1-").toString
    val df = (1 to 500).map(i =>
      (i.toLong, if (i % 10 == 0) null else s"name$i", i % 25, i * 1.5))
      .toDF("k", "nm", "grp", "amt")
    val t = GraftTable.create(spark, s"$wh/a1", "a1", df.schema, Seq("k"),
      Seq(HashComponent(Seq("k"), 4)), data = Some(df))
    t.analyze()
    val cs = t.meta.colStats.get
    assert(t.meta.analyzedVersion.contains(t.currentVersion))
    assert(cs("k").nullCount == 0 && cs("k").min.contains("1") &&
      cs("k").max.contains("500"))
    assert(cs("k").ndv > 450 && cs("k").ndv < 550) // HLL approx of 500
    assert(cs("nm").nullCount == 50 && cs("nm").maxLen.contains(7L))
    assert(cs("grp").min.contains("0") && cs("grp").max.contains("24") &&
      cs("grp").ndv >= 24 && cs("grp").ndv <= 26)
    // the V2 scan hands them to Spark
    val scan = new graft.sources.v2.GraftV2Scan(t.meta, t.scan().schema, Array.empty)
    val st = scan.estimateStatistics()
    val byName = scala.jdk.CollectionConverters.MapHasAsScala(st.columnStats())
      .asScala.map { case (ref, s) => ref.fieldNames.head -> s }
    assert(byName("k").distinctCount().getAsLong == cs("k").ndv)
    assert(byName("k").min().get() == 1L) // catalyst internal value
    assert(byName("nm").nullCount().getAsLong == 50)
  }

  test("catalyst folds the reported stats into relation attribute stats") {
    val wh = Files.createTempDirectory("graft-an2-").toString
    val df = (1 to 300).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    val t = GraftTable.create(spark, s"$wh/a2", "a2", df.schema, Seq("k"),
      Seq(HashComponent(Seq("k"), 2)), data = Some(df))
    t.analyze()
    spark.conf.set("spark.sql.catalog.gan2", classOf[graft.sources.v2.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gan2.warehouse", wh)
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val q = spark.table("gan2.a2").filter(col("k") > 0)
      val stats = q.queryExecution.optimizedPlan.stats
      val attr = stats.attributeStats.toSeq.map { case (a, s) => a.name -> s }.toMap
      assert(attr.contains("k"), s"expected attribute stats for k: $stats")
      assert(attr("k").distinctCount.exists(d => d > 250 && d < 350))
      assert(attr("k").min.contains(1L) && attr("k").max.contains(300L))
    } finally spark.conf.unset("spark.sql.cbo.enabled")
  }

  test("SQL CALL analyze returns the per-column report") {
    val wh = Files.createTempDirectory("graft-an3-").toString
    val df = (1 to 100).map(i => (i.toLong, s"x$i")).toDF("k", "v")
    GraftTable.create(spark, s"$wh/a3", "a3", df.schema, Seq("k"),
      Seq(HashComponent(Seq("k"), 2)), data = Some(df))
    spark.conf.set("spark.sql.catalog.gan3", classOf[graft.sources.v2.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gan3.warehouse", wh)
    val rows = spark.sql("CALL gan3.system.analyze('a3')").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == Set("k", "v"))
    assert(rows("k") > 90 && rows("k") < 110)
  }

  test("histograms: equi-height bins cover [min,max] and reach catalyst") {
    val wh = Files.createTempDirectory("graft-an5-").toString
    val df = (1 to 1000).map(i => (i.toLong, i % 100)).toDF("k", "g")
    val t = GraftTable.create(spark, s"$wh/a5", "a5", df.schema, Seq("k"),
      Seq(HashComponent(Seq("k"), 2)), data = Some(df))
    t.analyze(histograms = true, histogramBins = 10)
    val cs = t.meta.colStats.get
    val bins = cs("k").histogram.get
    assert(bins.size == 10)
    assert(math.abs(bins.head.lo - 1.0) < 2 && math.abs(bins.last.hi - 1000.0) < 2)
    assert(bins.forall(b => b.hi >= b.lo))
    assert(cs("k").histogramHeight.exists(h => h > 99 && h < 101)) // 1000/10
    // through the V2 stats into catalyst's attribute histogram
    spark.conf.set("spark.sql.catalog.gan5", classOf[graft.sources.v2.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gan5.warehouse", wh)
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val q = spark.table("gan5.a5").filter(col("k") > 0)
      val attr = q.queryExecution.optimizedPlan.stats.attributeStats.toSeq
        .map { case (a, s) => a.name -> s }.toMap
      val h = attr("k").histogram
      assert(h.isDefined && h.get.bins.length == 10, s"histogram lost: $attr")
    } finally spark.conf.unset("spark.sql.cbo.enabled")
  }

  test("date/timestamp histograms bin over the catalyst-internal domain") {
    val wh = Files.createTempDirectory("graft-an6-").toString
    val df = (1 to 365).map(i => (i.toLong,
      java.sql.Date.valueOf(java.time.LocalDate.of(2020, 1, 1).plusDays(i - 1)),
      java.sql.Timestamp.valueOf(s"2021-01-01 00:00:00").toInstant
        .plusSeconds(i * 3600L) match { case t => java.sql.Timestamp.from(t) }))
      .toDF("k", "d", "ts")
    val t = GraftTable.create(spark, s"$wh/a6", "a6", df.schema, Seq("k"),
      Seq(HashComponent(Seq("k"), 2)), data = Some(df))
    t.analyze(histograms = true, histogramBins = 8)
    val cs = t.meta.colStats.get
    val dBins = cs("d").histogram.get
    assert(dBins.size == 8)
    // days-since-epoch domain: 2020-01-01 = 18262
    assert(math.abs(dBins.head.lo - 18262.0) < 2 &&
      math.abs(dBins.last.hi - (18262.0 + 364)) < 2, dBins.toString)
    val tsBins = cs("ts").histogram.get
    // micros domain: 2021-01-01T01:00Z = 1609462800000000
    assert(math.abs(tsBins.head.lo - 1.6094628e15) < 1e10 &&
      tsBins.last.hi > tsBins.head.lo, tsBins.toString)
  }

  test("analyze covers the merge-on-read state, not just the base") {
    val wh = Files.createTempDirectory("graft-an4-").toString
    val df = (1 to 100).map(i => (i.toLong, i)).toDF("k", "x")
    val t = GraftTable.create(spark, s"$wh/a4", "a4", df.schema, Seq("k"),
      Seq(HashComponent(Seq("k"), 2)), data = Some(df))
    t.upsert(Seq((1L, 5000)).toDF("k", "x")) // raises max(x)
    t.delete(Seq(Tuple1(100L)).toDF("k"))
    t.analyze()
    val cs = t.meta.colStats.get
    assert(cs("x").max.contains("5000"))
    assert(cs("k").max.contains("99")) // key 100 deleted
  }

  test("timestamp min/max round-trip is session-timezone-free") {
    // analyze() stores zoned-timestamp min/max as INTERNAL micros; the CBO
    // read side reconstructs the same micros no matter what timezone either
    // session ran in (a tz-dependent string shifted the CBO's range by the
    // zone offset before).
    val wh = Files.createTempDirectory("graft-an7-").toString
    val loMicros = 1609459200000000L // 2021-01-01T00:00:00Z
    val hiMicros = loMicros + 99L * 3600L * 1000000L
    val df = (0 to 99).map(_.toLong).toDF("k")
      .withColumn("ts", expr(s"timestamp_micros(k * 3600000000 + ${loMicros}L)"))
    val t = GraftTable.create(spark, s"$wh/a7", "a7", df.schema, Seq("k"),
      Seq(HashComponent(Seq("k"), 2)), data = Some(df))
    val tzBefore = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
      t.analyze()
    } finally spark.conf.set("spark.sql.session.timeZone", tzBefore)
    val cs = t.meta.colStats.get
    assert(cs("ts").min.contains(loMicros.toString) &&
      cs("ts").max.contains(hiMicros.toString), cs("ts").toString)
    val scan = new graft.sources.v2.GraftV2Scan(t.meta, t.scan().schema, Array.empty)
    val byName = scala.jdk.CollectionConverters.MapHasAsScala(
      scan.estimateStatistics().columnStats())
      .asScala.map { case (ref, s) => ref.fieldNames.head -> s }
    assert(byName("ts").min().get() == loMicros &&
      byName("ts").max().get() == hiMicros)
  }
}
