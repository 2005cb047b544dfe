package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.HashComponent
import graft.table.GraftTable

/**
 * Footer-vs-manifest schema audit (`GraftTable.verifyFileSchemas`, surfaced
 * as `fsck(verifySchemas = true)`): scans read every committed file under
 * the PHYSICAL schema the manifest implies — the invariant holds for every
 * engine writer, but a foreign or hand-edited file whose footer disagrees
 * would otherwise surface as an opaque vectorized-reader type error (or
 * silent nulls) at scan time. The audit names the file and field instead.
 */
class SchemaAuditSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("clean table audits clean; a foreign wrong-typed file is named") {
    val wh = Files.createTempDirectory("graft-schemaaudit-").toString
    val df = (1 to 50).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    val t = GraftTable.create(spark, s"$wh/t", "sa1", df.schema, Seq("k"),
      Seq(HashComponent(Seq("k"), 2)), data = Some(df))
    t.upsert(Seq((1L, "u1")).toDF("k", "v")) // a delta file too
    assert(t.verifyFileSchemas().isEmpty,
      "an engine-written table must audit clean")
    assert(graft.tools.GraftTools.fsck(t.location, verifySchemas = true).isEmpty)

    // hand-swap one base file with a file whose 'v' column is an INT —
    // the manifest still records STRING. The physical column name is the
    // manifest's physName, so write the impostor under it.
    val physV = t.meta.column("v").physName
    val physK = t.meta.column("k").physName
    val victim = t.meta.baseFiles.head.path
    val impostorDir = Files.createTempDirectory("graft-schemaaudit-imp-").toString
    Seq((1L, 7)).toDF(physK, physV).coalesce(1)
      .write.mode("overwrite").parquet(impostorDir)
    val part = Files.list(Paths.get(impostorDir)).iterator()
    var impostor: java.nio.file.Path = null
    while (part.hasNext) {
      val p = part.next()
      if (p.toString.endsWith(".parquet")) impostor = p
    }
    // the local FS keeps a Hadoop checksum sibling (.<name>.crc) from the
    // original write — stale after the swap, it would fail the footer read
    // with a checksum error before the schema compare can run
    val victimPath = Paths.get(victim)
    Files.deleteIfExists(victimPath.resolveSibling(
      "." + victimPath.getFileName.toString + ".crc"))
    Files.copy(impostor, victimPath, StandardCopyOption.REPLACE_EXISTING)
    val issues = t.verifyFileSchemas()
    assert(issues.exists(i => i.contains(victim) && i.contains(physV)),
      s"the swapped file's wrong-typed column must be named, got: $issues")
  }
}
