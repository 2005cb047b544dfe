package graft

import org.apache.spark.sql.connector.read.streaming.ReadLimit
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.HashComponent
import graft.sources.v2.{GraftMicroBatchStream, GraftStreamOffset}
import graft.table.GraftTable

/**
 * Byte-based streaming admission control (`graft.maxBytesPerTrigger`):
 * maxVersionsPerTrigger caps the version COUNT, but version sizes vary by
 * orders of magnitude between a trickle writer and a bulk upsert — the
 * byte cap is what actually bounds a micro-batch's executor memory.
 */
class StreamAdmissionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("maxBytesPerTrigger steps the offset by cumulative version bytes") {
    val loc = java.nio.file.Files.createTempDirectory("graft-adm-").toString
    val df = (1 to 50).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    val t = GraftTable.create(spark, loc, "adm", df.schema, Seq("k"),
      Seq(HashComponent(Seq("k"), 2)), data = Some(df))
    val v0 = t.currentVersion
    (1 to 5).foreach(i => t.upsert(Seq((i.toLong, s"u$i")).toDF("k", "v")))
    val head = t.currentVersion
    assert(head == v0 + 5)
    def stream(cap: Option[Long]) = new GraftMicroBatchStream(
      t.meta, t.meta.schema, Some(v0), 64, cap)
    def step(s: GraftMicroBatchStream, from: Long): Long =
      s.latestOffset(GraftStreamOffset(from), ReadLimit.allAvailable())
        .asInstanceOf[GraftStreamOffset].version

    // 1-byte cap: every version is over it, but at least one version is
    // always admitted — the stream steps one version per trigger
    val tiny = stream(Some(1L))
    var v = v0
    var batches = 0
    while (v < head) { v = step(tiny, v); batches += 1 }
    assert(batches == 5, s"1-byte cap must drain one version per trigger, took $batches")

    // cap sized for ~2 versions: strictly fewer triggers than versions,
    // strictly more than one
    val twoSize = {
      val m = graft.catalog.TableMeta.read(t.location, v0 + 1)
      2 * m.deltaFiles.filter(_.seq == v0 + 1)
        .map(f => GraftTable.fileSize(f.path)).sum
    }
    val two = stream(Some(twoSize))
    v = v0; batches = 0
    while (v < head) { v = step(two, v); batches += 1 }
    assert(batches >= 2 && batches < 5, s"~2-version cap took $batches triggers")

    // no cap: one trigger to head (within the version bound)
    assert(step(stream(None), v0) == head)

    // end-to-end: the capped stream still delivers every committed row
    val f = new java.io.File(loc)
    spark.conf.set("spark.sql.catalog.gadm",
      classOf[graft.sources.v2.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gadm.warehouse", f.getParent)
    val mem = s"adm_${System.nanoTime()}"
    val ckpt = java.nio.file.Files.createTempDirectory("graft-adm-ckpt-").toString
    val q = spark.readStream
      .option("graft.startingVersion", v0.toString)
      .option("graft.maxBytesPerTrigger", "1")
      .table(s"gadm.`${f.getName}`")
      .writeStream.outputMode("append").format("memory").queryName(mem)
      .option("checkpointLocation", ckpt).start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.table(mem).count() == 5, "all upsert images must arrive")
  }
}
