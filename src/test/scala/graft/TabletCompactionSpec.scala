package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.{HashComponent, RangeComponent}
import graft.table.GraftTable

/** Per-tablet MAJOR compaction (the O(tablet + deltas) maintenance path —
  * a 100 TB table never pays [[GraftTable.compact]]'s full rewrite):
  * folds one tablet's deltas into its base, leaves other tablets' files
  * untouched, keeps scans/diffs/CDC exact. */
class TabletCompactionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-tc-").toString

  test("compactTablet folds one bucket; other tablets untouched; reads exact") {
    val data = (1 to 100).map(i => (i, s"v$i")).toDF("k", "v")
    val t = GraftTable.create(spark, tmp(), "kv",
      StructType(Seq(StructField("k", IntegerType, false), StructField("v", StringType))),
      keys = Seq("k"), hash = Seq(HashComponent(Seq("k"), 2)), data = Some(data))
    t.upsert((1 to 30).map(i => (i, s"u$i")).toDF("k", "v"))
    t.delete((91 to 100).map(i => (i, "")).toDF("k", "v"))
    val expected = ((1 to 30).map(i => i -> s"u$i") ++
      (31 to 90).map(i => i -> s"v$i")).toMap
    val v1 = t.currentVersion
    val baseBefore = t.meta.baseFiles
    // pick list: both buckets carry delta pressure before the fold
    val statsBefore = t.deltaTabletStats().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(statsBefore.keySet == Set(0, 1), statsBefore.toString)

    t.compactTablet(bucket = Some(0))

    // the whole table reads exactly; only bucket 0's base was rewritten
    assert(t.scan().collect().map(r => r.getInt(0) -> r.getString(1)).toMap == expected)
    val m = t.meta
    val keptB1 = baseBefore.filter(_.bucket.contains(1)).map(_.path).toSet
    assert(m.baseFiles.filter(_.bucket.contains(1)).map(_.path).toSet == keptB1,
      "bucket 1 base files must be untouched")
    assert(m.baseFiles.filter(_.bucket.contains(0)).map(_.path).toSet !=
      baseBefore.filter(_.bucket.contains(0)).map(_.path).toSet)
    // bucket 0's delta pressure is gone; bucket 1's rows remain (folded)
    val statsAfter = t.deltaTabletStats().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(statsAfter.keySet == Set(1), statsAfter.toString)
    assert(m.deltaFiles.forall(_.path.contains("_deltamerge_")))
    // the V2 merge-on-read overlay serves the half-folded state too
    val whName = java.nio.file.Paths.get(t.location).getFileName.toString
    spark.conf.set("spark.sql.catalog.gtc",
      classOf[graft.sources.v2.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gtc.warehouse",
      java.nio.file.Paths.get(t.location).getParent.toString)
    assert(spark.table(s"gtc.`$whName`").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap == expected)
    // a second fold empties the delta set entirely
    t.compactTablet(bucket = Some(1))
    assert(t.meta.deltaFiles.isEmpty)
    assert(t.scan().collect().map(r => r.getInt(0) -> r.getString(1)).toMap == expected)
    assert(graft.tools.GraftTools.fsck(t.location).isEmpty)

    // diff scans crossing the folds fall back to the logical diff and stay
    // exact: (v1, now] saw no logical change; (0-base, now] sees them all
    assert(t.changesSince(v1, t.currentVersion).count() == 0)
    val d = t.changesSince(1, t.currentVersion)
    assert(d.filter(col("_deleted")).count() == 10)
    assert(d.filter(!col("_deleted")).count() == 30)
  }

  test("compactTablet by range key folds one range partition") {
    val rows = (1 to 60).map(i =>
      (i, java.sql.Date.valueOf(s"${2020 + i % 3}-0${1 + i % 9}-15"), s"v$i"))
      .toDF("id", "d", "v")
    val t = GraftTable.create(spark, tmp(), "ranged", rows.schema,
      keys = Seq("id"), hash = Nil,
      range = Some(RangeComponent("d", "year")), data = Some(rows))
    t.upsert(rows.filter(col("id") <= 20).withColumn("v", concat(lit("u"), col("id"))))
    val expected = (1 to 60).map(i => i -> (if (i <= 20) s"u$i" else s"v$i")).toMap
    t.compactTablet(rangeKey = Some("2020"))
    assert(t.scan().collect().map(r => r.getInt(0) -> r.getString(2)).toMap == expected)
    // only 2020's rows folded out of the delta set
    val remaining = t.deltaTabletStats().collect().map(_.getString(0)).toSet
    assert(!remaining.contains("2020"), remaining.toString)
    assert(graft.tools.GraftTools.fsck(t.location).isEmpty)
    // change stream: the upserts once, the fold zero times
    val cs = graft.streaming.GraftStreaming.changeStream(spark, t)
    val name = s"cs_tc_${System.nanoTime()}"
    val q = cs.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    assert(spark.table(name).count() == 20)
  }

  test("compactTablet writes ~1/buckets of a full compact's bytes (I/O win)") {
    // the base >> delta regime the O(tablet) claim is about: a 16-bucket
    // base with all delta pressure on ONE tablet. Wall time is job-floor
    // noise locally, so the assertion is on BYTES WRITTEN — the fold must
    // rewrite one tablet's share of the base, not the whole base.
    val buckets = 16
    val data = (1 to 8000).map(i => (i, s"payload_$i" * 8)).toDF("k", "v")
    val t = GraftTable.create(spark, tmp(), "kv",
      StructType(Seq(StructField("k", IntegerType, false), StructField("v", StringType))),
      keys = Seq("k"), hash = Seq(HashComponent(Seq("k"), buckets)), data = Some(data))
    val b0 = data
      .withColumn("_bk", GraftTable.bucketExpr(t.meta, org.apache.spark.sql.functions.col))
      .filter(col("_bk") === 0).drop("_bk")
    t.upsert(b0.withColumn("v", concat(lit("u"), col("v"))))
    assert(t.deltaTabletStats().collect().map(_.getInt(0)).toSet == Set(0))
    def bytesWritten(op: => Unit): Long = {
      val before = (t.meta.baseFiles ++ t.meta.deltaFiles).map(_.path).toSet
      op
      val m = t.meta
      (m.baseFiles ++ m.deltaFiles).filterNot(f => before(f.path))
        .map(f => GraftTable.fileSize(f.path)).sum
    }
    val expected = t.scan().collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    val tabletBytes = bytesWritten(t.compactTablet(bucket = Some(0)))
    val fullBytes = bytesWritten(t.compact())
    assert(tabletBytes > 0 && fullBytes > 0)
    val ratio = tabletBytes.toDouble / fullBytes
    info(f"compactTablet wrote $tabletBytes bytes vs compact's $fullBytes (ratio $ratio%.4f, 1/buckets = ${1.0 / buckets}%.4f)")
    assert(ratio < 2.0 / buckets,
      f"per-tablet fold wrote $ratio%.3f of a full compact ($tabletBytes vs " +
        f"$fullBytes bytes) — expected ~${1.0 / buckets}%.3f")
    assert(t.scan().collect().map(r => r.getInt(0) -> r.getString(1)).toMap == expected)
  }

  test("maintain(perTablet) folds pressured tablets instead of the whole base") {
    val data = (1 to 100).map(i => (i, s"v$i")).toDF("k", "v")
    val t = GraftTable.create(spark, tmp(), "kv",
      StructType(Seq(StructField("k", IntegerType, false), StructField("v", StringType))),
      keys = Seq("k"), hash = Seq(HashComponent(Seq("k"), 4)), data = Some(data))
    val baseBefore = t.meta.baseFiles.map(_.path).toSet
    // pressure lands on the tablets holding keys 1..10 only
    t.upsert((1 to 10).map(i => (i, s"u$i")).toDF("k", "v"))
    val touched = t.deltaTabletStats().collect().map(_.getInt(0)).toSet
    assert(touched.size < 4, s"expected skewed pressure, got $touched")
    assert(t.maintain(maxDeltaRatio = 0.0001, perTablet = true))
    // delta set folded; only the pressured tablets' base files changed
    assert(t.meta.deltaFiles.isEmpty)
    val untouched = t.meta.baseFiles.filter(f => !touched.contains(f.bucket.get))
    assert(untouched.forall(f => baseBefore.contains(f.path)),
      "unpressured tablets must keep their base files")
    val expected = ((1 to 10).map(i => i -> s"u$i") ++
      (11 to 100).map(i => i -> s"v$i")).toMap
    assert(t.scan().collect().map(r => r.getInt(0) -> r.getString(1)).toMap == expected)
    assert(!t.maintain(perTablet = true)) // nothing left
  }

  test("maintainWarehouse sweeps every table; sick or clean tables don't stop it") {
    val wh = tmp()
    def mk(name: String): GraftTable = {
      val data = (1 to 40).map(i => (i, s"v$i")).toDF("k", "v")
      GraftTable.create(spark, s"$wh/$name", name,
        StructType(Seq(StructField("k", IntegerType, false), StructField("v", StringType))),
        keys = Seq("k"), hash = Seq(HashComponent(Seq("k"), 2)), data = Some(data))
    }
    val pressured = mk("pressured")
    pressured.upsert((1 to 40).map(i => (i, s"u$i")).toDF("k", "v"))
    mk("clean")
    Files.createDirectory(java.nio.file.Paths.get(wh, "not_a_table")) // ignored
    val report = graft.tools.GraftTools.maintainWarehouse(spark, wh,
      maxDeltaRatio = 0.0001)
    assert(report == Map("pressured" -> true, "clean" -> false), report.toString)
    assert(pressured.meta.deltaFiles.isEmpty)
    assert(pressured.scan().collect().map(r => r.getInt(0) -> r.getString(1)).toMap ==
      (1 to 40).map(i => i -> s"u$i").toMap)
  }

  test("maintainWarehouse folds distinct dirty tables concurrently") {
    val wh = tmp()
    def mk(name: String): GraftTable = {
      val data = (1 to 40).map(i => (i, s"v$i")).toDF("k", "v")
      GraftTable.create(spark, s"$wh/$name", name,
        StructType(Seq(StructField("k", IntegerType, false), StructField("v", StringType))),
        keys = Seq("k"), hash = Seq(HashComponent(Seq("k"), 2)), data = Some(data))
    }
    val ts = (1 to 4).map(i => mk(s"dirty$i"))
    ts.foreach(t => t.upsert((1 to 40).map(i => (i, s"u$i")).toDF("k", "v")))
    val report = graft.tools.GraftTools.maintainWarehouse(spark, wh,
      maxDeltaRatio = 0.0001, parallelism = 4)
    assert(report == (1 to 4).map(i => s"dirty$i" -> true).toMap, report.toString)
    ts.foreach { t =>
      assert(t.meta.deltaFiles.isEmpty)
      assert(t.scan().collect().map(r => r.getInt(0) -> r.getString(1)).toMap ==
        (1 to 40).map(i => i -> s"u$i").toMap)
    }
  }

  test("compactTablet refuses under pending range drops") {
    val rows = (1 to 20).map(i =>
      (i, java.sql.Date.valueOf(s"${2020 + i % 2}-03-15"), s"v$i")).toDF("id", "d", "v")
    val t = GraftTable.create(spark, tmp(), "dropped", rows.schema,
      keys = Seq("id"), hash = Nil,
      range = Some(RangeComponent("d", "year")), data = Some(rows))
    t.dropRangePartition("2021")
    val e = intercept[IllegalArgumentException] {
      t.compactTablet(rangeKey = Some("2020"))
    }
    assert(e.getMessage.contains("pending range drops"))
  }
}
