package graft

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import org.scalatest.funsuite.AnyFunSuite

/**
 * Fixture staleness guard: a registered fixture records its source parquet's
 * (size, mtime) fingerprint; a later load whose source no longer matches
 * re-registers instead of serving stale rows. The driver regenerates
 * testdata in place between rounds (round 8: events.parquet switched
 * physical timestamp type mid-day), so path-keyed caching alone is unsafe.
 */
class FixtureStalenessSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("source mtime change triggers re-registration; unchanged source is reused") {
    val sfDir = Files.createTempDirectory("graft-sf-").toString
    val src = Paths.get(s"$sfDir/region.parquet")
    Files.copy(Paths.get("/root/testdata/sf0.001/region.parquet"), src)

    val t1 = Tables.readonly(spark, sfDir, "region")
    assert(t1.scan().count() == 5)
    val tableDir = Paths.get(Tables.cacheRoot(sfDir), "region")
    assert(Files.exists(tableDir.resolve("source.fp")))
    // Plant a marker inside the registered fixture dir: re-registration
    // drops the whole dir, so marker survival == registration reuse.
    val marker = tableDir.resolve("_spec_marker")
    Files.writeString(marker, "x")

    // Unchanged source: a fresh-JVM load (simulated by cache eviction)
    // reuses the on-disk registration.
    Tables.evictCached(sfDir, "region")
    assert(Tables.readonly(spark, sfDir, "region").scan().count() == 5)
    assert(Files.exists(marker), "unchanged source must not re-register")

    // Regenerated source (mtime moved): the next load must re-register.
    Files.setLastModifiedTime(src,
      FileTime.fromMillis(Files.getLastModifiedTime(src).toMillis + 12345))
    Tables.evictCached(sfDir, "region")
    assert(Tables.readonly(spark, sfDir, "region").scan().count() == 5)
    assert(!Files.exists(marker), "stale source must drop + re-register")
    assert(Files.readString(tableDir.resolve("source.fp"))
      == Tables.sourceFingerprint(sfDir, "region"))
  }
}
