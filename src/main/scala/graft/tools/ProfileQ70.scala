package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.catalog.HashComponent
import graft.table.GraftTable

/** Dev harness: phase-level timing of the q70 MV-rewrite gate across
  * repeated runs — its bench iterations inflate 7 -> 17 s while its tail
  * is fast; this isolates which phase grows. Delete after use. */
object ProfileQ70 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      System.err.println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    def tmpLoc(prefix: String): String = {
      val f = java.nio.file.Files.createTempDirectory(prefix).toFile
      f.delete(); f.getAbsolutePath
    }
    def threadReport(tag: String): Unit = {
      val ts = Thread.getAllStackTraces.keySet()
      import scala.jdk.CollectionConverters._
      val names = ts.asScala.toSeq.map(_.getName).sorted
      System.err.println(s"[prof] threads($tag): ${names.size}")
      names.groupBy(n => n.replaceAll("[0-9]+", "N")).toSeq.sortBy(-_._2.size)
        .take(25).foreach { case (p, g) =>
          System.err.println(f"[prof]   ${g.size}%3d  $p") }
    }
    if (sys.env.get("PROF_Q18").contains("1")) {
      threadReport("before q18")
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("q18_stream_upsert")(spark, dir).count()
      System.err.println(f"[prof] q18 gate ${(System.nanoTime() - t0) / 1e9}%.2f s")
      threadReport("after q18")
    }
    val wh = tmpLoc("graft-prof70-wh-")
    spark.conf.set("spark.sql.catalog.gp70",
      classOf[graft.sources.v2.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gp70.warehouse", wh)
    (1 to 4).foreach { rep =>
      System.err.println(s"[prof] ---- rep $rep ----")
      val name = s"ord${System.nanoTime()}"
      val raw = Tables.raw(spark, dir, "orders")
      val tbl = t("create+load") {
        GraftTable.create(spark, s"$wh/$name", name,
          raw.schema, Seq("o_orderpriority", "o_orderkey"),
          Seq(HashComponent(Seq("o_orderkey"), 2)), data = Some(raw))
      }
      val rollup = t("rollup build") {
        MaterializedRollup.build(spark, tbl,
          Seq("o_orderpriority"), Seq(
            "n_rows" -> "count(*)",
            "sum_price" -> "sum(CAST(o_totalprice AS DECIMAL(28,2)))",
            "max_key" -> "max(o_orderkey)"),
          tmpLoc("graft-prof70r-"), buckets = 4)
      }
      graft.plans.RollupRewrite.enable(spark, rollup)
      try {
        def agg(base: DataFrame) = base.groupBy("o_orderpriority").agg(
          count(lit(1)).as("n_rows"),
          sum(expr("CAST(o_totalprice AS DECIMAL(28,2))")).as("sum_price"),
          max("o_orderkey").as("max_key"))
        def v2 = agg(spark.table(s"gp70.`$name`"))
        t("plan dsv1")(agg(tbl.scan()).queryExecution.optimizedPlan)
        t("plan v2")(v2.queryExecution.optimizedPlan)
        t("upsert") {
          val prev = spark.conf.get("spark.sql.shuffle.partitions")
          spark.conf.set("spark.sql.shuffle.partitions", 4)
          try tbl.upsert(tbl.scan()
            .filter(col("o_orderpriority") === "1-URGENT" &&
              col("o_orderkey") % 7 === 0)
            .withColumn("o_totalprice", col("o_totalprice") * 2))
          finally spark.conf.set("spark.sql.shuffle.partitions", prev)
        }
        t("plan stale")(v2.queryExecution.optimizedPlan)
        t("refresh")(MaterializedRollup.refresh(spark, rollup))
        t("plan served")(v2.queryExecution.optimizedPlan)
        def vg = spark.table(s"gp70.`$name`").agg(
          count(lit(1)).as("n_rows"),
          sum(expr("CAST(o_totalprice AS DECIMAL(28,2))")).as("sum_price"),
          max("o_orderkey").as("max_key"))
        t("plan global")(vg.queryExecution.optimizedPlan)
        val out = t("checkpoint+union") {
          val prev = spark.conf.get("spark.sql.shuffle.partitions")
          spark.conf.set("spark.sql.shuffle.partitions", 4)
          try v2.unionByName(vg.select(lit("__ALL__").as("o_orderpriority"),
            col("n_rows"), col("sum_price"), col("max_key")))
            .localCheckpoint(true)
          finally spark.conf.set("spark.sql.shuffle.partitions", prev)
        }
        t("final count")(out.count())
      } finally graft.plans.RollupRewrite.disable(spark, rollup.location)
    }
    spark.stop()
  }
}
