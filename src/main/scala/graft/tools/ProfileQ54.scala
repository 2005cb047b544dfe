package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.catalog.HashComponent
import graft.table.GraftTable

/** Scratch: step-level timing of the q54/q55 gate shapes (delete after). */
object ProfileQ54 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[t] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val raw = graft.Tables.raw(spark, dir, "supplier")
    raw.count()
    val loc = java.nio.file.Files.createTempDirectory("graft-prof54-").toString
    val t = timed("create+load")(GraftTable.create(spark, loc, "s54",
      raw.schema, Seq("s_suppkey"), Seq(HashComponent(Seq("s_suppkey"), 4)),
      data = Some(raw)))
    val full = java.nio.file.Files.createTempDirectory("graft-prof54-full-").toString
    timed("backup full")(GraftTools.backup(t, full))
    val v1 = t.currentVersion
    timed("txn gen1")(t.transaction { tx =>
      tx.upsert(raw.filter(pmod(col("s_suppkey"), lit(10)) === 3)
        .withColumn("s_acctbal", col("s_acctbal") + 100))
      tx.delete(raw.filter(pmod(col("s_suppkey"), lit(10)) === 7)
        .select("s_suppkey"))
    })
    val inc1 = java.nio.file.Files.createTempDirectory("graft-prof54-inc1-").toString
    val h1 = timed("backupIncremental 1")(GraftTools.backupIncremental(t, inc1, v1))
    timed("txn gen2")(t.transaction { tx =>
      tx.upsert(raw.filter(pmod(col("s_suppkey"), lit(10)) === 7)
        .withColumn("s_acctbal", col("s_acctbal") + 500))
      tx.delete(raw.filter(pmod(col("s_suppkey"), lit(10)) === 3)
        .select("s_suppkey"))
    })
    val inc2 = java.nio.file.Files.createTempDirectory("graft-prof54-inc2-").toString
    timed("backupIncremental 2")(GraftTools.backupIncremental(t, inc2, h1))
    val restored = timed("restoreChain")(GraftTools.restoreChain(spark, full,
      Seq(inc1, inc2), java.nio.file.Files.createTempDirectory("graft-prof54-d-").toString,
      Seq("s_suppkey"), Seq(HashComponent(Seq("s_suppkey"), 4))))
    timed("final scan")(restored.scan().orderBy("s_suppkey").count())
  }
}
