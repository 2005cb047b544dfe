package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.{HashComponent, TableMeta}
import graft.table.GraftTable

class PruningExtrasSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  test("multi-component hash pruning agrees with the writer layout") {
    val data = (1 to 200).map(i => (i.toLong, (i % 7).toLong, s"v$i")).toDF("a", "b", "v")
    val t = GraftTable.create(spark, tmp("graft-mc-"), "mc", data.schema,
      Seq("a", "b"),
      hash = Seq(HashComponent(Seq("a"), 3), HashComponent(Seq("b"), 2)),
      data = Some(data))
    assert(t.scanPruned(Nil).inputFiles.length == 6) // 3 × 2 buckets
    // point lookup on both components → exactly one bucket file
    val one = t.scanPruned(Seq(EqualTo("a", 42L), EqualTo("b", 0L)))
    assert(one.inputFiles.length == 1)
    assert(one.filter(col("a") === 42 && col("b") === 0).count() == 1)
    // constraint on only one component → no pruning (conservative)
    assert(t.scanPruned(Seq(EqualTo("a", 42L))).inputFiles.length == 6)
    // every row is found in the file its computed partition id points to
    val withPid = t.scan().withColumn("pid", t.partitionIdColumn())
      .withColumn("f", input_file_name()).collect()
    withPid.foreach { r =>
      assert(r.getAs[String]("f").contains(s"_b=${r.getAs[Int]("pid")}"))
    }
  }

  test("scanIndexed: Catalyst-pushed filters prune files automatically") {
    val data = (1 to 1000).map(i => (i.toLong, s"n$i")).toDF("id", "v")
    val t = GraftTable.create(spark, tmp("graft-idx-"), "t", data.schema, Seq("id"),
      Seq(HashComponent(Seq("id"), 8)), data = Some(data))
    def numFiles(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics("numFiles").value
      }.sum
    }
    assert(numFiles(t.scanIndexed()) == 8)
    assert(numFiles(t.scanIndexed().filter(col("id") === 42)) == 1)
    assert(numFiles(t.scanIndexed().filter(col("id").isin(1L, 2L, 3L))) == 3)
    // merge-on-read correctness on top of the indexed base
    t.upsert(Seq((42L, "X")).toDF("id", "v"))
    t.deleteWhere(col("id") === 100)
    assert(t.scanIndexed().orderBy("id").collect().toSeq ==
      t.scan().orderBy("id").collect().toSeq)
    // schema evolution → multiple generations → silent fallback, still correct
    t.addColumn("extra", org.apache.spark.sql.types.StringType, default = Some("d"))
    t.upsert(Seq((2000L, "new", "e")).toDF("id", "v", "extra"))
    t.compact() // compaction writes a fresh single-generation base again
    assert(t.scanIndexed().filter(col("id") === 2000).count() == 1)
  }

  test("scanAtTimestamp picks the right snapshot") {
    val t = GraftTable.create(spark, tmp("graft-ts-"), "ts",
      Seq((1, "a")).toDF("k", "v").schema, Seq("k"),
      data = Some(Seq((1, "a")).toDF("k", "v")))
    val ts1 = TableMeta.readCurrent(t.location).timestampMs
    Thread.sleep(5)
    t.upsert(Seq((1, "b")).toDF("k", "v"))
    assert(t.scanAtTimestamp(ts1).select("v").as[String].head() == "a")
    assert(t.scanAtTimestamp(System.currentTimeMillis()).select("v").as[String].head() == "b")
    intercept[IllegalArgumentException] { t.scanAtTimestamp(ts1 - 1000000) }
  }

  test("concurrent commit of the same version is rejected") {
    val t = GraftTable.create(spark, tmp("graft-cc-"), "cc",
      Seq((1, "a")).toDF("k", "v").schema, Seq("k"),
      data = Some(Seq((1, "a")).toDF("k", "v")))
    val m = TableMeta.readCurrent(t.location)
    // writer A commits v2
    t.upsert(Seq((1, "b")).toDF("k", "v"))
    // writer B, still holding v1 metadata, tries to commit its own v2
    intercept[IllegalStateException] {
      TableMeta.write(m.copy(version = m.version + 1, operation = "rogue"))
    }
  }
}
