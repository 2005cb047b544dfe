package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.catalog.HashComponent
import graft.table.GraftTable

/** Dev harness: phase-level timing of the q71 index-ladder gate shape.
  * Each ladder gate (q69, q71-q83) repeats this skeleton; whichever phase
  * dominates here dominates ~16 gates of the bench. Delete after use. */
object ProfileQ71 {
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
    val jobCount = new java.util.concurrent.atomic.AtomicInteger(0)
    val jobMs = new java.util.concurrent.atomic.AtomicLong(0L)
    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val verbose = sys.env.get("PROF_JOBS").contains("1")
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobCount.incrementAndGet(); jobStarts.put(j.jobId, j.time)
          if (verbose) {
            val desc = Option(j.properties)
              .flatMap(p => Option(p.getProperty("spark.job.description")))
              .getOrElse("")
            val stages = j.stageInfos.map(si =>
              s"${si.name.takeWhile(_ != '\n').take(90)}/${si.numTasks}t")
              .mkString(" | ")
            System.err.println(s"[prof]   job ${j.jobId}: $desc  [$stages]")
          }
        }
        override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          Option(jobStarts.remove(j.jobId)).foreach { t0 =>
            jobMs.addAndGet(j.time - t0)
            if (verbose) System.err.println(s"[prof]   job ${j.jobId} end ${j.time - t0} ms")
          }
        }
      })
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val j0 = jobCount.get(); val m0 = jobMs.get()
      val r = body
      Thread.sleep(30) // let listener events drain
      System.err.println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s" +
        f"  jobs ${jobCount.get() - j0}%3d  jobMs ${jobMs.get() - m0}%6d")
      r
    }
    def tmpLoc(prefix: String): String = {
      val f = java.nio.file.Files.createTempDirectory(prefix).toFile
      f.delete(); f.getAbsolutePath
    }
    // 3 reps: rep 1 is JIT-cold, reps 2-3 approximate the bench's timed runs
    (1 to 3).foreach { rep =>
      System.err.println(s"[prof] ---- rep $rep ----")
      val raw = t("raw read")(Tables.raw(spark, dir, "customer"))
      val tab = t("create+load") {
        GraftTable.create(spark, tmpLoc("graft-prof71b-"), "customer_p71",
          raw.schema, Seq("c_custkey"),
          Seq(HashComponent(Seq("c_custkey"), 4)), data = Some(raw))
      }
      val idx = t("index build") {
        SecondaryIndex.build(spark, tab, "c_name", tmpLoc("graft-prof71i-"),
          buckets = 16)
      }
      try {
        def q1 = tab.scan().filter(col("c_name") === "Customer#000000011")
        t("probe plan (fresh)")(q1.queryExecution.optimizedPlan)
        t("probe exec")(q1.count())
        t("upsert") {
          val prev = spark.conf.get("spark.sql.shuffle.partitions")
          spark.conf.set("spark.sql.shuffle.partitions", 4)
          try tab.upsert(tab.scan().filter(col("c_custkey") === 11)
            .withColumn("c_name", lit("RENAMED#000000011")))
          finally spark.conf.set("spark.sql.shuffle.partitions", prev)
        }
        t("probe plan (stale)")(q1.queryExecution.optimizedPlan)
        t("refresh")(SecondaryIndex.refresh(spark, idx))
        val f = new java.io.File(tab.location)
        t("v2 catalog set") {
          spark.conf.set("spark.sql.catalog.gprof71",
            classOf[graft.sources.v2.GraftCatalog].getName)
          spark.conf.set("spark.sql.catalog.gprof71.warehouse", f.getParent)
        }
        val v2 = spark.table(s"gprof71.`${f.getName}`")
          .filter(col("c_name").isin("RENAMED#000000011",
            "Customer#000000042", "Customer#000000011"))
        t("v2 probe plan")(v2.queryExecution.optimizedPlan)
        val ck = t("localCheckpoint") {
          val prev = spark.conf.get("spark.sql.shuffle.partitions")
          spark.conf.set("spark.sql.shuffle.partitions", 4)
          try v2.localCheckpoint(true)
          finally spark.conf.set("spark.sql.shuffle.partitions", prev)
        }
        t("final count")(ck.orderBy("c_custkey").count())
      } finally graft.plans.IndexRewrite.disable(spark, idx.location)
    }
    spark.stop()
  }
}
