package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft._
import graft.catalog.HashComponent
import graft.table._

/** Scratch profiler: where do q18's per-batch seconds go? */
object ProfileQ18 {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobCount = new java.util.concurrent.atomic.AtomicInteger(0)
    val jobMs = new java.util.concurrent.atomic.AtomicLong(0L)
    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobCount.incrementAndGet(); jobStarts.put(j.jobId, j.time)
        }
        override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          Option(jobStarts.remove(j.jobId)).foreach(t0 => jobMs.addAndGet(j.time - t0))
      })
    def t[A](tag: String)(body: => A): A = {
      val t0 = System.nanoTime(); val j0 = jobCount.get(); val m0 = jobMs.get()
      val r = body
      Thread.sleep(20)
      System.err.println(f"[prof] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s" +
        f"  jobs ${jobCount.get() - j0}%2d jobMs ${jobMs.get() - m0}%5d"); r
    }
    val raw = Tables.raw(spark, sfDir, "events")
    val tbl = t("create") { GraftTable.create(spark, java.nio.file.Files.createTempDirectory("prof-q18-").toString,
      "events_prof", raw.schema, Seq("event_id"), Seq(HashComponent(Seq("event_id"), 4))) }
    val all = t("collect") { raw.collect() }
    spark.conf.set("graft.delta.writePartitions", "1")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    val schema = raw.schema
    import scala.jdk.CollectionConverters._
    for (b <- 0 until 10) {
      val rows = all.filter(r => r.getLong(0) % 10 == b)
      val df = spark.createDataFrame(rows.toSeq.asJava, schema)
      t(s"upsert b$b (${rows.length} rows)") { tbl.upsert(df) }
    }
    t("final scan count") { println(tbl.scan().count()) }
    spark.stop()
  }
}
