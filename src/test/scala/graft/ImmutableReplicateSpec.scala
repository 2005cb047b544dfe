package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.HashComponent
import graft.table.{GraftTable, PrimaryKeyException}
import graft.tools.GraftTools

class ImmutableReplicateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft-ir-").toString

  private def mk(): GraftTable = {
    val data = Seq((1L, "a", 10), (2L, "b", 20)).toDF("k", "v", "fixed")
    GraftTable.create(spark, tmp(), "t", data.schema, Seq("k"),
      Seq(HashComponent(Seq("k"), 2)), data = Some(data))
  }

  test("immutable column: upsert errors, upsertIgnore preserves (W6)") {
    val t = mk()
    t.setImmutable("fixed")
    intercept[PrimaryKeyException] {
      t.upsert(Seq((1L, "a2", 99)).toDF("k", "v", "fixed"))
    }
    t.upsertIgnore(Seq((1L, "a2", 99), (3L, "c", 30)).toDF("k", "v", "fixed"))
    val got = t.scan().collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    // existing row: v updated, fixed preserved; new row: fully inserted
    assert(got == Map(1L -> ("a2", 10), 2L -> ("b", 20), 3L -> ("c", 30)))
  }

  test("replicate applies upserts and deletes since a version (E6)") {
    val src = mk()
    val dest = GraftTools.copyTable(spark, src, tmp())
    val v0 = src.currentVersion
    src.upsert(Seq((1L, "x", 10)).toDF("k", "v", "fixed"))
    src.deleteWhere(col("k") === 2)
    GraftTools.replicate(src, dest, v0)
    assert(dest.scan().collect().map(r => r.getLong(0) -> r.getString(1)).toMap ==
      Map(1L -> "x"))
  }

  test("partitionIdColumn matches where the writer put the rows (D6)") {
    val t = mk()
    val withPid = t.scan().withColumn("pid", t.partitionIdColumn())
    // every row's computed pid equals the bucket dir its file lives in
    val rows = withPid.withColumn("file", input_file_name()).collect()
    rows.foreach { r =>
      val pid = r.getAs[Int]("pid")
      val file = r.getAs[String]("file")
      assert(file.contains(s"_b=$pid"), s"row pid=$pid file=$file")
    }
  }

  test("drop removes metadata and data (D3)") {
    val t = mk()
    val loc = t.location
    GraftTable.drop(loc)
    assert(!GraftTable.exists(loc))
  }

  test("sql over engine table via view (E1)") {
    val t = mk()
    t.createOrReplaceView("t_view")
    assert(spark.sql("SELECT count(*) FROM t_view WHERE k = 1").as[Long].head() == 1L)
  }
}
