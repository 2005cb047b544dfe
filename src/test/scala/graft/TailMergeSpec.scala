package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.HashComponent
import graft.table.GraftTable

/**
 * In-place tail-merge (the reference's minor delta compaction,
 * tablet/delta_compaction.cc: merge delta files without touching the base
 * or earlier stores): `mergeTailDeltas` folds the coordinate-less tail
 * into one compact still-unrouted fileset, and the streaming sink runs it
 * past `graft.stream.maxTailFiles` so a sustained micro-batch stream
 * keeps a bounded file count BETWEEN real flushes — with the maintenance
 * policy (compact / compactDeltas) never involved.
 */
class TailMergeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def history(loc: String, current: Long): Seq[String] =
    (1L to current).map(v => graft.catalog.TableMeta.read(loc, v).operation)

  test("mergeTailDeltas folds the tail only; state, CDC, and ordering survive") {
    val wh = Files.createTempDirectory("graft-tm1-").toString
    val df = (1 to 200).map(i => (i.toLong, s"a$i")).toDF("k", "v")
    val t = GraftTable.create(spark, s"$wh/tm1", "tm1", df.schema, Seq("k"),
      Seq(HashComponent(Seq("k"), 4)), data = Some(df))
    t.upsert(Seq((1L, "flushed")).toDF("k", "v"))
    t.compactDeltas() // routed fileset that the tail-merge must NOT touch
    val flushed = t.meta.deltaFiles.map(_.path).toSet
    assert(flushed.nonEmpty)
    // overlapping tail commits incl. a tombstone and a re-upsert
    t.upsert(Seq((1L, "t1"), (2L, "t1")).toDF("k", "v"))
    t.delete(Seq(Tuple1(3L)).toDF("k"))
    t.upsert(Seq((2L, "t3"), (300L, "new")).toDF("k", "v"))
    val before = t.scan().collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // 3 tail commits; each fileset carries DeltaWritePartitions part files
    val tailBefore = t.meta.deltaFiles.count(f => f.bucket.isEmpty && f.rangeKey.isEmpty)
    assert(tailBefore >= 3)

    assert(t.mergeTailDeltas())
    val m = t.meta
    assert(m.operation == "merge_tail")
    // flushed filesets carried by identity; tail collapsed to one file
    assert(flushed.subsetOf(m.deltaFiles.map(_.path).toSet))
    val tail = m.deltaFiles.filter(f => f.bucket.isEmpty && f.rangeKey.isEmpty)
    assert(tail.size == 1, m.deltaFiles.map(_.path).toString)
    assert(tail.head.path.contains("_deltamerge_"),
      "the merged tail must carry the token the streaming sources exclude")
    assert(tail.head.keyLo.isDefined && tail.head.keyHi.isDefined,
      "the merged tail must record its key bounds")
    // nothing to do on a single-file tail
    assert(!t.mergeTailDeltas())
    // state identical, incl. through the V2 overlay
    val after = t.scan().collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(after == before)
    assert(after(1L) == "t1" && after(2L) == "t3" && after(300L) == "new" &&
      !after.contains(3L))
    // ordering vs NEWER commits: a later upsert still beats the merged tail
    t.upsert(Seq((2L, "t4")).toDF("k", "v"))
    assert(t.scan().filter(col("k") === 2).select("v").as[String].head() == "t4")
    // CDC: the diff across the whole window shows the NET change per key
    // (folds themselves are invisible to the change feed)
    val ch = t.changes(1, t.currentVersion)
      .collect().map(r => (r.getLong(0), r.getBoolean(r.length - 1))).toMap
    assert(ch(3L) && !ch(2L) && !ch(300L)) // 3 deleted; 2 and 300 upserted
  }

  test("sink bounds its tail file count without ever flushing or compacting") {
    val wh = Files.createTempDirectory("graft-tm2-").toString
    val df = (1 to 100).map(i => (i.toLong, s"a$i", i % 5)).toDF("id", "name", "grp")
    val t = GraftTable.create(spark, s"$wh/tm2", "tm2", df.schema, Seq("id"),
      Seq(HashComponent(Seq("id"), 4)), data = Some(df))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, Int)]
    val ckpt = Files.createTempDirectory("graft-tm2-ckpt-").toString
    val bound = 5
    val q = ms.toDF().toDF("id", "name", "grp")
      .writeStream.format("graft")
      .option("graft.table.path", s"$wh/tm2")
      .option("graft.maintain.every", "0") // maintenance policy OFF
      .option("graft.stream.maxTailFiles", bound.toString)
      .option("checkpointLocation", ckpt)
      .outputMode("update")
      .start()
    try {
      (1 to 20).foreach { i =>
        ms.addData((400L + i, s"m$i", 0))
        q.processAllAvailable()
        val tailNow = t.meta.deltaFiles.count(
          f => f.bucket.isEmpty && f.rangeKey.isEmpty)
        assert(tailNow <= bound + 1,
          s"batch $i left $tailNow tail filesets (bound $bound)")
      }
    } finally q.stop()
    // 20 commits, bounded tail, and ONLY upsert/merge_tail commits — the
    // maintenance ops never ran
    val ops = history(t.location, t.currentVersion).toSet
    assert(!ops.contains("compact") && !ops.contains("compact_deltas") &&
      !ops.contains("compact_tablet"), ops.toString)
    assert(ops.contains("merge_tail"), ops.toString)
    assert(t.meta.deltaFiles.forall(f => f.bucket.isEmpty && f.rangeKey.isEmpty),
      "tail-merge must never produce routed (flushed) filesets")
    // exactness after all the merging
    assert(t.scan().count() == 120)
    assert(t.scan().filter(col("id") === 420).select("name").as[String].head() == "m20")
    // CDC exactness across the merged window: each streamed key seen once
    val ch = t.changes(1, t.currentVersion)
      .filter(col("id") > 400).collect()
    assert(ch.length == 20)
  }

  test("graft.stream.maxTailFiles=0 disables the sink tail-merge") {
    val wh = Files.createTempDirectory("graft-tm3-").toString
    val df = (1 to 50).map(i => (i.toLong, s"a$i", 0)).toDF("id", "name", "grp")
    val t = GraftTable.create(spark, s"$wh/tm3", "tm3", df.schema, Seq("id"),
      Seq(HashComponent(Seq("id"), 2)), data = Some(df))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, Int)]
    val ckpt = Files.createTempDirectory("graft-tm3-ckpt-").toString
    val q = ms.toDF().toDF("id", "name", "grp")
      .writeStream.format("graft")
      .option("graft.table.path", s"$wh/tm3")
      .option("graft.maintain.every", "0")
      .option("graft.stream.maxTailFiles", "0")
      .option("checkpointLocation", ckpt)
      .outputMode("update")
      .start()
    try {
      (1 to 8).foreach { i => ms.addData((500L + i, s"m$i", 0)); q.processAllAvailable() }
    } finally q.stop()
    // one FILESET per micro-batch, untouched (each holds >= 1 part file)
    val filesets = t.meta.deltaFiles.map(f =>
      java.nio.file.Paths.get(f.path).getParent.toString).distinct
    assert(filesets.size == 8, filesets.toString)
    assert(t.meta.deltaFiles.forall(!_.path.contains("_deltamerge_")))
  }
}
