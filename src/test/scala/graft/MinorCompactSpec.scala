package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.HashComponent
import graft.table.GraftTable

/**
 * Incremental minor delta compaction (reference: repeated minor passes in
 * tablet/delta_compaction.cc): `compactDeltas(tailOnly = true)` folds ONLY
 * the unflushed tail — the commits since the last flush — and carries every
 * earlier flushed fileset over in the manifest BY IDENTITY. Under a
 * sustained write stream the Nth flush is O(tail), never O(total deltas):
 * the alternative re-folds the 10^4 files already flushed on every pass.
 * Cross-fileset key overlap resolves at read time by the per-row seq fold,
 * exactly as overlapping delta stores merge in the reference.
 */
class MinorCompactSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def stateOf(t: GraftTable): Map[Long, String] =
    t.scan().collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("tail-only fold keeps flushed filesets by identity; O(tail) asserted") {
    val wh = Files.createTempDirectory("graft-minor1-").toString
    val df = (1 to 400).map(i => (i.toLong, s"a$i")).toDF("k", "v")
    val t = GraftTable.create(spark, s"$wh/m1", "m1", df.schema, Seq("k"),
      Seq(HashComponent(Seq("k"), 4)), data = Some(df))
    t.upsert((1 to 100).map(i => (i.toLong, s"u$i")).toDF("k", "v"))
    t.delete(Seq(Tuple1(400L)).toDF("k"))
    t.compactDeltas() // full flush: everything routed
    val flushed = t.meta.deltaFiles.map(_.path).toSet
    assert(flushed.nonEmpty && t.meta.deltaFiles.forall(_.bucket.isDefined))
    // tail commits on top of the flushed set
    t.upsert((50 to 150).map(i => (i.toLong, s"t$i")).toDF("k", "v"))
    t.delete(Seq(Tuple1(1L)).toDF("k"))
    t.upsert(Seq((900L, "new")).toDF("k", "v"))
    val tailCount = t.meta.deltaFiles.count(f => f.bucket.isEmpty && f.rangeKey.isEmpty)
    assert(tailCount >= 3, s"expected >=3 coordinate-less tail files, got $tailCount")
    t.compactDeltas(tailOnly = true)
    val after = t.meta.deltaFiles
    // the original flushed files survive with the SAME paths — the minor
    // pass never rewrote them (the O(tail) claim as an identity check)
    assert(flushed.subsetOf(after.map(_.path).toSet),
      s"minor fold must not touch flushed filesets:\n$flushed\nvs\n${after.map(_.path)}")
    assert(after.forall(_.bucket.isDefined), "folded tail must come out routed")
    assert(after.count(f => !flushed.contains(f.path)) <= 4, // one per bucket
      "tail fold must collapse to at most one file per tablet")
    val s = stateOf(t)
    assert(s.size == 399 && s(50L) == "t50" && s(2L) == "u2" && s(200L) == "a200" &&
      s(900L) == "new" && !s.contains(1L) && !s.contains(400L))
  }

  test("cross-fileset key overlap resolves by per-row seq at read") {
    val wh = Files.createTempDirectory("graft-minor2-").toString
    val df = (1 to 50).map(i => (i.toLong, s"a$i")).toDF("k", "v")
    val t = GraftTable.create(spark, s"$wh/m2", "m2", df.schema, Seq("k"),
      Seq(HashComponent(Seq("k"), 2)), data = Some(df))
    t.upsert(Seq((7L, "v1")).toDF("k", "v"))
    t.compactDeltas() // 7 -> v1 flushed
    t.upsert(Seq((7L, "v2")).toDF("k", "v"))
    t.compactDeltas(tailOnly = true) // second fileset for the same tablet
    assert(stateOf(t)(7L) == "v2") // newer seq wins across filesets
    t.delete(Seq(Tuple1(7L)).toDF("k"))
    t.compactDeltas(tailOnly = true)
    val s = stateOf(t)
    assert(!s.contains(7L) && s.size == 49)
    // V2 read agrees (routed attachment folds all filesets per split)
    spark.conf.set("spark.sql.catalog.gmc2", classOf[graft.sources.v2.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gmc2.warehouse", wh)
    val v2 = spark.table("gmc2.m2").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(v2 == s)
  }

  test("maintain folds only the tail when the tail is the file-count pressure") {
    val wh = Files.createTempDirectory("graft-minor3-").toString
    val df = (1 to 100).map(i => (i.toLong, s"a$i")).toDF("k", "v")
    val t = GraftTable.create(spark, s"$wh/m3", "m3", df.schema, Seq("k"),
      Seq(HashComponent(Seq("k"), 2)), data = Some(df))
    t.upsert(Seq((1L, "u1")).toDF("k", "v"))
    t.compactDeltas()
    val flushed = t.meta.deltaFiles.map(_.path).toSet
    (1 to 6).foreach(i => t.upsert(Seq((i.toLong, s"m$i")).toDF("k", "v")))
    // ratio low (tiny deltas), file count 6 tail + flushed > 4 => minor fold
    assert(t.maintain(maxDeltaRatio = 1000.0, maxDeltaFiles = 4))
    assert(flushed.subsetOf(t.meta.deltaFiles.map(_.path).toSet),
      "maintain's minor pass must keep flushed filesets")
    val s = stateOf(t)
    (1 to 6).foreach(i => assert(s(i.toLong) == s"m$i"))
  }

  test("SQL CALL compact_deltas(tail_only => true)") {
    val wh = Files.createTempDirectory("graft-minor4-").toString
    val df = (1 to 60).map(i => (i.toLong, s"a$i")).toDF("k", "v")
    val t = GraftTable.create(spark, s"$wh/m4", "m4", df.schema, Seq("k"),
      Seq(HashComponent(Seq("k"), 2)), data = Some(df))
    t.upsert(Seq((5L, "x5")).toDF("k", "v"))
    t.compactDeltas()
    val flushed = t.meta.deltaFiles.map(_.path).toSet
    t.upsert(Seq((6L, "x6")).toDF("k", "v"))
    t.delete(Seq(Tuple1(7L)).toDF("k"))
    spark.conf.set("spark.sql.catalog.gmc4", classOf[graft.sources.v2.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gmc4.warehouse", wh)
    val out = spark.sql("CALL gmc4.system.compact_deltas('m4', tail_only => true)")
      .collect()
    assert(out.length == 1 && out(0).getLong(0) == t.currentVersion)
    val t2 = GraftTable.load(spark, s"$wh/m4")
    assert(flushed.subsetOf(t2.meta.deltaFiles.map(_.path).toSet))
    assert(t2.meta.deltaFiles.count(f => f.bucket.isEmpty) == 0)
    val s = stateOf(t2)
    assert(s(5L) == "x5" && s(6L) == "x6" && !s.contains(7L) && s.size == 59)
  }

  test("diff scan stays exact across a minor pass") {
    val wh = Files.createTempDirectory("graft-minor5-").toString
    val df = (1 to 40).map(i => (i.toLong, s"a$i")).toDF("k", "v")
    val t = GraftTable.create(spark, s"$wh/m5", "m5", df.schema, Seq("k"),
      Seq(HashComponent(Seq("k"), 2)), data = Some(df))
    val v0 = t.currentVersion
    t.upsert(Seq((1L, "u1")).toDF("k", "v"))
    t.compactDeltas()
    t.upsert(Seq((2L, "u2")).toDF("k", "v"))
    t.compactDeltas(tailOnly = true)
    t.delete(Seq(Tuple1(3L)).toDF("k"))
    val ch = t.changes(v0, t.currentVersion).collect()
      .map(r => r.getLong(r.fieldIndex("k")) ->
        r.getBoolean(r.fieldIndex("_deleted"))).toMap
    assert(ch == Map(1L -> false, 2L -> false, 3L -> true),
      s"each op exactly once across the minor folds: $ch")
  }
}
