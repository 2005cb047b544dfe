package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness: attribute q63's per-batch cost — engine source planning
  * vs Spark state-store overhead — from StreamingQueryProgress durations. */
object ProfileQ63 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        import scala.jdk.CollectionConverters._
        val d = p.durationMs.asScala.toSeq.sortBy(-_._2)
          .map { case (k, v) => s"$k=$v" }.mkString(" ")
        System.err.println(s"[q63prof] batch=${p.batchId} rows=${p.numInputRows} $d")
      }
    }
    spark.streams.addListener(listener)
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("q63_stream_join")(spark, dir).count()
      System.err.println(f"[q63prof] run $i total ${(System.nanoTime() - t0) / 1e9}%.2f s")
      graft.Pipeline.releaseTransient()
      graft.table.MaintenanceScheduler.clearAuto()
    }
    spark.stop()
  }
}
