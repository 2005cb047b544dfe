package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness: run the ScaleSmoke ladder standalone. Delete after use. */
object ProfileScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rows = sys.env.getOrElse("PROF_SCALE_ROWS", "20000000").toLong
    val r = ScaleSmoke.run(spark, rows)
    r.steps.foreach { case (n, s) => println(f"[scale] $n%-24s $s%8.2f s") }
    r.stats.foreach { case (n, v) => println(s"[scale] $n = $v") }
    spark.stop()
  }
}
