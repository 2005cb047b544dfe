package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.catalog._
import graft.table._

/** Dev harness: per-stage timing of the q68 rollup gate. */
object ProfileQ68 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    graft.SparkEntry.queries("q68_incr_rollup")(spark, dir).collect() // warm
    val jobCount = new java.util.concurrent.atomic.AtomicInteger(0)
    val jobMs = new java.util.concurrent.atomic.AtomicLong(0L)
    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val verbose = sys.env.get("PROF_JOBS").contains("1")
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobCount.incrementAndGet(); jobStarts.put(j.jobId, j.time)
          if (verbose) {
            val stages = j.stageInfos.map(si =>
              s"${si.name.takeWhile(_ != '\n').take(60)}/${si.numTasks}t").mkString(" | ")
            System.err.println(s"[prof]   job ${j.jobId}: [$stages]")
          }
        }
        override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          Option(jobStarts.remove(j.jobId)).foreach { t0 =>
            jobMs.addAndGet(j.time - t0)
            if (verbose) System.err.println(s"[prof]   job ${j.jobId} end ${j.time - t0} ms")
          }
      })
    def t[A](label: String)(f: => A): A = {
      val s = System.nanoTime; val j0 = jobCount.get(); val m0 = jobMs.get()
      val r = f
      Thread.sleep(30)
      println(f"[prof] $label%-18s ${(System.nanoTime - s) / 1e9}%.2f s" +
        f"  jobs ${jobCount.get() - j0}%3d  jobMs ${jobMs.get() - m0}%6d"); r
    }
    def few[A](f: => A): A = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      try f finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    val raw = graft.Tables.raw(spark, dir, "orders")
    val loc = java.nio.file.Files.createTempDirectory("prof68-").toString
    val tbl = t("create+load") {
      GraftTable.create(spark, loc + "/b", "orders_p68",
        raw.schema, Seq("o_orderpriority", "o_orderkey"),
        Seq(HashComponent(Seq("o_orderkey"), 2)),
        range = Some(RangeComponent("o_orderpriority", "value")),
        data = Some(raw))
    }
    val rollup = t("rollup build") {
      MaterializedRollup.build(spark, tbl,
        Seq("o_orderpriority"), Seq(
          "n_rows" -> "count(*)",
          "sum_price" -> "sum(CAST(o_totalprice AS DECIMAL(28,2)))",
          "max_key" -> "max(o_orderkey)"), loc + "/r", buckets = 4)
    }
    t("txn commit") {
      few {
        tbl.transaction { txn =>
          txn.upsert(tbl.scan()
            .filter(col("o_orderpriority") === "1-URGENT" &&
              col("o_orderkey") % 7 === 0)
            .withColumn("o_totalprice", col("o_totalprice") * 2))
          txn.delete(tbl.scan().filter(col("o_orderpriority") === "5-LOW")
            .select("o_orderpriority", "o_orderkey"))
          txn.insert(raw.filter(col("o_orderkey") % 11 === 0)
            .withColumn("o_orderkey", col("o_orderkey") + lit(10000000L))
            .withColumn("o_orderpriority", lit("9-SYNTH"))
            .withColumn("o_totalprice", (col("o_orderkey") % 1000).cast("double")))
        }
      }
    }
    t("refresh") { few { MaterializedRollup.refresh(spark, rollup, assertPrune = true) } }
    t("final scan") { rollup.scan().orderBy("o_orderpriority").collect() }
    // refresh internals, step by step (a second mutation so there is CDC)
    few {
      tbl.upsert(tbl.scan()
        .filter(col("o_orderpriority") === "2-HIGH" && col("o_orderkey") % 13 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 3))
    }
    val p = rollup.properties
    val src = t("  load src") { GraftTable.load(spark, p(MaterializedRollup.SrcLocKey)) }
    val v0 = p(MaterializedRollup.SrcVersionKey).toLong
    val v1 = src.meta.version
    val touched = t("  changes+distinct") {
      val d = src.changesSince(v0, v1).select(col("o_orderpriority")).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      d.limit(4097).collect()
    }
    println(s"[prof]   touched groups: ${touched.length}")
    t("  refresh again") { few { MaterializedRollup.refresh(spark, rollup, assertPrune = true) } }
    spark.stop()
  }
}
