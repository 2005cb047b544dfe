package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: does the SPJ (q30 shape) plan carry SortExec nodes that a
  * Scan-side SupportsReportOrdering could remove? */
object ProfileSPJ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    graft.Tables.readonly(spark, dir, "documents")
    graft.Tables.readonly(spark, dir, "embeddings")
    spark.conf.set("spark.sql.catalog.gspj",
      classOf[graft.sources.v2.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gspj.warehouse", graft.Tables.cacheRoot(dir))
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val d = spark.table("gspj.documents")
    val e = spark.table("gspj.embeddings")
    val j = d.join(e, d("doc_id") === e("vec_id")).select("doc_id", "label")
    j.queryExecution.toRdd.count()
    val plan = j.queryExecution.executedPlan.toString
    println("=== SPJ join plan ===")
    println(plan.linesIterator.filter(l =>
      l.contains("Sort") || l.contains("Join") || l.contains("Exchange") ||
        l.contains("BatchScan")).mkString("\n"))
    println("Sort lines: " + plan.linesIterator.count(_.contains("Sort [")))
  }
}
