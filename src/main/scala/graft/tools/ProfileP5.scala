package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Dev-only p5 candidate-volume probe (scratch; deleted after use). */
object ProfileP5 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val e = graft.Tables.scan(spark, sfDir, "embeddings")
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("bks", hyperplaneBuckets(col("v"), dim = 64, tables = 16, planes = 6))
    val flat = e.select(col("vec_id"), posexplode(col("bks")).as(Seq("t", "bk")))
      .repartition(32, col("t"), col("bk")).persist()
    time("flat")(flat.count())
    // bucket-occupancy distribution
    val occ = flat.groupBy("t", "bk").count()
    occ.agg(min("count"), expr("percentile(count, 0.5)"), expr("percentile(count, 0.9)"),
      max("count"), sum(col("count") * (col("count") - 1) / 2).as("raw_pairs")).show()
    val cand = flat.as("a").join(flat.as("b"),
        col("a.t") === col("b.t") && col("a.bk") === col("b.bk") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
    time("raw candidates")(println("raw=" + cand.count()))
    val dis = cand.distinct().persist()
    time("distinct candidates")(println("distinct=" + dis.count()))
    val ev = e.select(col("vec_id"), col("v"))
    val out = dis
      .join(ev.select(col("vec_id").as("id_a"), col("v").as("va")), "id_a")
      .join(ev.select(col("vec_id").as("id_b"), col("v").as("vb")), "id_b")
      .filter(cosine(col("va"), col("vb")) >= 0.45)
    time("verify join")(println("pairs=" + out.count()))
    spark.stop()
  }
}
