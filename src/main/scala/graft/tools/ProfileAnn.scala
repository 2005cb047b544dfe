package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.table.GraftTable

/** Dev harness: isolate the ScaleSmoke ann_index_build rung. Delete after use. */
object ProfileAnn {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val annRows = sys.env.getOrElse("PROF_ANN_ROWS", "100000").toLong
    val wh = java.nio.file.Files.createTempDirectory("prof-ann-").toString
    val vecs = spark.range(annRows).select(col("id"), expr(
      "transform(sequence(0, 15), d -> cast(pmod(id * 31 + d * 17, 97) - 48 as float))")
      .as("emb"))
    def t[A](label: String)(f: => A): A = {
      val s = System.nanoTime; val r = f
      println(f"[prof] $label%-18s ${(System.nanoTime - s) / 1e9}%.2f s"); r
    }
    val src = t("src create") {
      GraftTable.create(spark, s"$wh/scale_vec", "scale_vec",
        vecs.schema, Seq("id"), data = Some(vecs))
    }
    println(s"[prof] src base files: ${src.meta.baseFiles.length}")
    val idx = t("vindex build") {
      VectorIndex.build(spark, src, "id", "emb", s"$wh/scale_vec_idx", buckets = 32)
    }
    println(s"[prof] idx base files: ${idx.meta.baseFiles.length}")
    spark.stop()
  }
}
