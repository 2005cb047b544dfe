package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.{HashComponent, RangeComponent}
import graft.sources.v2.{GraftCountScan, GraftV2Scan}
import graft.table.GraftTable

/**
 * V2 scan-side COUNT(*) and LIMIT pushdown (round-10 verdict item 3):
 * a clean snapshot serves COUNT(*) from manifest footer row counts with
 * no file scan; LIMIT plans only a file prefix covering the limit and
 * truncates each partition's reader. Both refuse under deltas/filters.
 */
class CountLimitPushdownSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def scans(df: org.apache.spark.sql.DataFrame)
      : Seq[org.apache.spark.sql.connector.read.Scan] = {
    // descend through AQE wrappers: AdaptiveSparkPlanExec has no children,
    // so a plain collect misses scans under an ORDER BY's exchange
    def all(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.connector.read.Scan] = p.collect {
      case b: BatchScanExec => Seq(b.scan)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        all(a.executedPlan)
    }.flatten
    all(df.queryExecution.executedPlan)
  }

  private def mkTable(n: Int, buckets: Int): (GraftTable, String, String) = {
    import spark.implicits._
    val loc = java.nio.file.Files.createTempDirectory("graft-clp-").toString
    val data = (1 to n).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    val t = GraftTable.create(spark, loc, "clp", data.schema, Seq("k"),
      Seq(HashComponent(Seq("k"), buckets)), data = Some(data))
    val f = new java.io.File(loc)
    spark.conf.set("spark.sql.catalog.gclp",
      classOf[graft.sources.v2.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gclp.warehouse", f.getParent)
    (t, s"gclp.`${f.getName}`", loc)
  }

  test("clean COUNT(*) is metadata-only; dirty and filtered counts scan") {
    val (t, sqlName, _) = mkTable(200, 4)
    val clean = spark.sql(s"SELECT count(*) AS c FROM $sqlName")
    val cs = scans(clean)
    assert(cs.exists(_.isInstanceOf[GraftCountScan]),
      s"clean count must use the metadata scan:\n${clean.queryExecution.executedPlan}")
    assert(clean.head.getLong(0) == 200L)

    // filtered: the predicate is post-scan, so Spark never offers the
    // aggregation — and the answer must reflect the filter
    val filtered = spark.sql(s"SELECT count(*) AS c FROM $sqlName WHERE k <= 50")
    assert(!scans(filtered).exists(_.isInstanceOf[GraftCountScan]))
    assert(filtered.head.getLong(0) == 50L)

    // dirty: pending tombstones change the live count — must fall back
    t.deleteWhere(col("k") <= 10)
    val dirty = spark.sql(s"SELECT count(*) AS c FROM $sqlName")
    assert(!scans(dirty).exists(_.isInstanceOf[GraftCountScan]),
      "a delta-carrying snapshot must not serve the metadata count")
    assert(dirty.head.getLong(0) == 190L)

    // compaction folds the tombstones → clean again, at the NEW count
    t.compact()
    val clean2 = spark.sql(s"SELECT count(*) AS c FROM $sqlName")
    assert(scans(clean2).exists(_.isInstanceOf[GraftCountScan]))
    assert(clean2.head.getLong(0) == 190L)
  }

  test("LIMIT plans a clean-snapshot file prefix and truncates readers") {
    val (t, sqlName, _) = mkTable(400, 8)
    assert(t.meta.baseFiles.length >= 8)
    val lim = spark.sql(s"SELECT k FROM $sqlName LIMIT 5")
    val v2 = scans(lim).collectFirst { case s: GraftV2Scan => s }
    assert(v2.isDefined, s"expected a graft scan:\n${lim.queryExecution.executedPlan}")
    // the pushed limit shows in the scan description and the planned
    // partitions cover only a prefix of the fileset
    assert(v2.get.description().contains("limit=5"))
    // count planned FILES, not partitions: a reported key grouping
    // (ambient v2 bucketing from an earlier suite) keeps one partition
    // per bucket even when the file prefix is cut
    val planned = v2.get.planInputPartitions()
      .collect { case f: org.apache.spark.sql.execution.datasources.FilePartition => f }
      .map(_.files.length).sum
    assert(planned < t.meta.baseFiles.length,
      s"limit must prune the planned fileset: $planned files planned of " +
        s"${t.meta.baseFiles.length}")
    assert(lim.collect().length == 5)

    // dirty snapshot: file-prefix refused (a file's rows may all be
    // tombstoned) but the result stays correct via reader truncation +
    // Spark's re-applied limit
    t.deleteWhere(col("k") % 2 === 0)
    val dl = spark.sql(s"SELECT k FROM $sqlName LIMIT 7")
    assert(dl.collect().length == 7)
    assert(spark.sql(s"SELECT k FROM $sqlName").count() == 200L)
  }

  test("LIMIT file prefix survives a reported key grouping (SPJ bucketing on)") {
    // regression: with v2 bucketing enabled the scan reports a
    // KeyGroupedPartitioning and used to skip the limit cut entirely —
    // one partition per bucket, every file planned (surfaced by suite
    // ordering when MorSpillSpec left the conf on)
    val (t, sqlName, _) = mkTable(400, 8)
    val prev = spark.conf.get("spark.sql.sources.v2.bucketing.enabled", "false")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      val lim = spark.sql(s"SELECT k FROM $sqlName LIMIT 5")
      val v2 = scans(lim).collectFirst { case s: GraftV2Scan => s }
      assert(v2.isDefined)
      val planned = v2.get.planInputPartitions()
        .collect { case f: org.apache.spark.sql.execution.datasources.FilePartition => f }
      // the bucket layout is preserved (one split per bucket) but only a
      // file prefix is planned into them
      assert(planned.length == t.meta.baseFiles.length,
        "key grouping must keep one partition per bucket")
      assert(planned.map(_.files.length).sum < t.meta.baseFiles.length,
        s"limit must prune the planned fileset under key grouping")
      assert(lim.collect().length == 5)
    } finally spark.conf.set("spark.sql.sources.v2.bucketing.enabled", prev)
  }

  test("LIMIT larger than the table returns every row") {
    val (_, sqlName, _) = mkTable(30, 2)
    assert(spark.sql(s"SELECT k FROM $sqlName LIMIT 1000").count() == 30L)
  }

  test("TOP-N on the lead PK plans only the files that can hold the top-n") {
    import spark.implicits._
    // registered-in-place multi-file parquet with DISJOINT key ranges —
    // the time-series layout where the cut pays off (hash buckets carry
    // near-full-range bounds and conservatively keep everything)
    val wh = java.nio.file.Files.createTempDirectory("graft-topn-").toString
    (1 to 400).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .repartitionByRange(8, col("k")).write.parquet(s"$wh/raw")
    val t = GraftTable.register(spark, s"$wh/reg", "reg", s"$wh/raw", Seq("k"))
    assert(t.meta.baseFiles.length == 8)
    spark.conf.set("spark.sql.catalog.gtopn",
      classOf[graft.sources.v2.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gtopn.warehouse", wh)
    def run(sql: String, expectFiles: Int): Seq[Long] = {
      val q = spark.sql(sql)
      val v2 = scans(q).collectFirst { case s: GraftV2Scan => s }
      assert(v2.isDefined, s"expected graft scan:\n${q.queryExecution.executedPlan}")
      assert(v2.get.description().contains("top="),
        s"top-n not pushed: ${v2.get.description()}")
      val parts = v2.get.planInputPartitions().length
      assert(parts <= expectFiles,
        s"top-n must cut the fileset: $parts partitions (wanted <= $expectFiles)")
      q.collect().map(_.getLong(0)).toSeq
    }
    // ascending: the lowest ~50-row file covers n=5
    assert(run("SELECT k FROM gtopn.reg ORDER BY k LIMIT 5", 2) ==
      (1L to 5L))
    // descending: the highest file only
    assert(run("SELECT k FROM gtopn.reg ORDER BY k DESC LIMIT 5", 2) ==
      (400L to 396L by -1))
    // dirty snapshot: an upserted key could enter the top-n — full fileset,
    // result still exact
    t.upsert(Seq((0L, "new-min")).toDF("k", "v"))
    val dq = spark.sql("SELECT k FROM gtopn.reg ORDER BY k LIMIT 3")
    assert(dq.collect().map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
  }

  test("MIN/MAX on the first PK column decode from manifest key bounds") {
    val (t, sqlName, _) = mkTable(250, 4)
    val q = spark.sql(
      s"SELECT min(k) AS lo, max(k) AS hi, count(*) AS c FROM $sqlName")
    assert(scans(q).exists(_.isInstanceOf[GraftCountScan]),
      s"mixed MIN/MAX/COUNT must be metadata-only:\n${q.queryExecution.executedPlan}")
    val r = q.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((1L, 250L, 250L)))

    // a non-PK column serves from the per-file zone maps (ZoneMapSpec
    // covers the full matrix; here just the decode correctness)
    val nk = spark.sql(s"SELECT min(v) AS lo FROM $sqlName")
    assert(scans(nk).exists(_.isInstanceOf[GraftCountScan]))
    assert(nk.head.getString(0) == "v1")

    // dirty snapshot: an upsert could move the extremes — must scan
    t.deleteWhere(col("k") === 1)
    val dirty = spark.sql(s"SELECT min(k) AS lo FROM $sqlName")
    assert(!scans(dirty).exists(_.isInstanceOf[GraftCountScan]))
    assert(dirty.head.getLong(0) == 2L)
    // compaction folds → metadata again, at the new extreme
    t.compact()
    val again = spark.sql(s"SELECT min(k) AS lo FROM $sqlName")
    assert(scans(again).exists(_.isInstanceOf[GraftCountScan]))
    assert(again.head.getLong(0) == 2L)
  }

  test("MIN/MAX bound decode round-trips string, date, timestamp, decimal PKs") {
    import spark.implicits._
    def check[A](df: org.apache.spark.sql.DataFrame, minSql: String,
        expect: (org.apache.spark.sql.Row => A)): A = {
      val loc = java.nio.file.Files.createTempDirectory("graft-clpx-").toString
      val t = GraftTable.create(spark, loc, "clpx", df.schema,
        Seq(df.schema.fieldNames.head),
        Seq(HashComponent(Seq(df.schema.fieldNames.head), 2)), data = Some(df))
      val f = new java.io.File(loc)
      spark.conf.set("spark.sql.catalog.gclpx",
        classOf[graft.sources.v2.GraftCatalog].getName)
      spark.conf.set("spark.sql.catalog.gclpx.warehouse", f.getParent)
      val q = spark.sql(s"SELECT $minSql FROM gclpx.`${f.getName}`")
      assert(scans(q).exists(_.isInstanceOf[GraftCountScan]),
        s"$minSql must be metadata-only:\n${q.queryExecution.executedPlan}")
      expect(q.head)
    }
    // string PK (UTF-8 hex bounds)
    val sdf = Seq("apple", "zebra", "Émile", "mango").toDF("s")
      .withColumn("v", length(col("s")))
    assert(check(sdf, "min(s) AS lo, max(s) AS hi",
      r => (r.getString(0), r.getString(1))) == (("apple", "Émile")))
    // date PK (internal days)
    val ddf = Seq("2021-03-04", "1969-12-01", "2030-01-31").toDF("x")
      .select(to_date(col("x")).as("d")).withColumn("v", lit(1))
    assert(check(ddf, "min(d) AS lo, max(d) AS hi",
      r => (r.getDate(0).toString, r.getDate(1).toString)) ==
      (("1969-12-01", "2030-01-31")))
    // timestamp PK (internal micros)
    val tdf = Seq("2021-03-04 05:06:07.000123", "1969-12-01 23:59:59")
      .toDF("x").select(to_timestamp(col("x")).as("ts")).withColumn("v", lit(1))
    assert(check(tdf, "min(ts) AS lo, max(ts) AS hi",
      r => (r.getTimestamp(0).getTime, r.getTimestamp(1).getTime)) ==
      ((java.sql.Timestamp.valueOf("1969-12-01 23:59:59").getTime,
        java.sql.Timestamp.valueOf("2021-03-04 05:06:07.000123").getTime)))
    // decimal(12,2) PK (unscaled-long bounds)
    val cdf = Seq("12345.67", "-999.99", "0.01").toDF("x")
      .select(col("x").cast("decimal(12,2)").as("m")).withColumn("v", lit(1))
    assert(check(cdf, "min(m) AS lo, max(m) AS hi",
      r => (r.getDecimal(0).toPlainString, r.getDecimal(1).toPlainString)) ==
      (("-999.99", "12345.67")))
  }

  test("grouped aggregate: file-constant groups serve from metadata, others fall back") {
    import spark.implicits._
    val loc = java.nio.file.Files.createTempDirectory("graft-gagg-").toString
    // value-granularity range on cat → every file constant on cat
    val data = (1 to 120)
      .map(i => (i.toLong, if (i % 3 == 0) "a" else "b", s"p$i"))
      .toDF("k", "cat", "p")
    GraftTable.create(spark, loc, "gagg", data.schema, Seq("k"),
      Seq(HashComponent(Seq("k"), 2)),
      range = Some(RangeComponent("cat", "value")), data = Some(data))
    val f = new java.io.File(loc)
    spark.conf.set("spark.sql.catalog.gaggmeta",
      classOf[graft.sources.v2.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gaggmeta.warehouse", f.getParent)
    val name = s"gaggmeta.`${f.getName}`"
    val grouped = spark.sql(
      s"SELECT cat, count(*) AS n, min(k) AS lo, max(k) AS hi " +
        s"FROM $name GROUP BY cat ORDER BY cat")
    assert(scans(grouped).exists(_.isInstanceOf[GraftCountScan]),
      s"grouped fold must be metadata-only:\n${grouped.queryExecution.executedPlan}")
    val rows = grouped.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq(("a", 40L, 3L, 120L), ("b", 80L, 1L, 119L)))
    // grouping by a NON-file-constant column falls back and stays correct
    val fb = spark.sql(s"SELECT p, count(*) AS n FROM $name GROUP BY p")
    assert(!scans(fb).exists(_.isInstanceOf[GraftCountScan]),
      "per-row-distinct group column must not fold from zone maps")
    assert(fb.count() == 120L)
    // MIN/MAX of a non-encodable (double) measure falls back too
    val dbl = spark.sql(
      s"SELECT cat, min(k + 0.5) AS m FROM $name GROUP BY cat")
    assert(!scans(dbl).exists(_.isInstanceOf[GraftCountScan]))
  }

  test("grouped COUNT splits mixed-null files exactly; MIN/MAX refuse on mixed") {
    import spark.implicits._
    val loc = java.nio.file.Files.createTempDirectory("graft-gmix-").toString
    // one bucket → ONE file holding a constant value plus nulls (mixed)
    val data = (1 to 50)
      .map(i => (i.toLong, if (i % 5 == 0) None else Some("a")))
      .toDF("k", "cat")
    GraftTable.create(spark, loc, "gmix", data.schema, Seq("k"),
      Seq(HashComponent(Seq("k"), 1)), data = Some(data))
    val f = new java.io.File(loc)
    spark.conf.set("spark.sql.catalog.gmix",
      classOf[graft.sources.v2.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gmix.warehouse", f.getParent)
    val name = s"gmix.`${f.getName}`"
    // COUNT-only: the null count splits the file's rows exactly
    val cnt = spark.sql(
      s"SELECT cat, count(*) AS n FROM $name GROUP BY cat")
    assert(scans(cnt).exists(_.isInstanceOf[GraftCountScan]),
      s"mixed-file grouped COUNT must fold from metadata:\n${cnt.queryExecution.executedPlan}")
    val m = cnt.collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(m == Map(Some("a") -> 40L, None -> 10L))
    // MIN/MAX over a mixed file cannot attribute bounds to one group
    val mm = spark.sql(
      s"SELECT cat, min(k) AS lo FROM $name GROUP BY cat")
    assert(!scans(mm).exists(_.isInstanceOf[GraftCountScan]),
      "mixed files must refuse grouped MIN/MAX")
    assert(mm.collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap ==
      Map(Some("a") -> 1L, None -> 5L))
  }
}
