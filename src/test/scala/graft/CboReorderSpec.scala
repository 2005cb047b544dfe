package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.HashComponent
import graft.table.GraftTable

/**
 * ANALYZE statistics driving Spark's cost-based join reorder over engine
 * tables (D4 consumed by the planner, the reason the reference exposes
 * table statistics at all): a 3-table join written in a bad textual order
 * must come out of the optimizer with the selectively-filtered dimension
 * joined first — visible only from the analyze() NDV/min-max/histogram
 * stats, which the V2 scan serves through columnStats.
 */
class CboReorderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Leaf relation names in join-tree order (left-deep: first = driven
    * table, then each joined relation outward). */
  private def leafOrder(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collectLeaves().map(_.toString)
      .map { s =>
        Seq("fact", "dimpart", "dimsupp").find(s.contains).getOrElse("?")
      }

  private def mkTables(wh: String, tag: String): (GraftTable, GraftTable, GraftTable) = {
    val fact = (1 to 4000).map { i =>
      (i.toLong, (i % 200 + 1).toLong, (i % 40 + 1).toLong, (i % 7 + 1).toLong)
    }.toDF("id", "pk", "sk", "qty")
    val part = (1 to 200).map(i => (i.toLong, i % 50 + 1, s"part$i")).toDF("p_pk", "p_size", "p_name")
    val supp = (1 to 40).map(i => (i.toLong, s"supp$i")).toDF("s_sk", "s_name")
    val tf = GraftTable.create(spark, s"$wh/fact", "fact", fact.schema,
      Seq("id"), Seq(HashComponent(Seq("id"), 4)), data = Some(fact))
    val tp = GraftTable.create(spark, s"$wh/dimpart", "dimpart", part.schema,
      Seq("p_pk"), Seq(HashComponent(Seq("p_pk"), 2)), data = Some(part))
    val ts = GraftTable.create(spark, s"$wh/dimsupp", "dimsupp", supp.schema,
      Seq("s_sk"), Seq(HashComponent(Seq("s_sk"), 2)), data = Some(supp))
    spark.conf.set(s"spark.sql.catalog.$tag", classOf[graft.sources.v2.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$tag.warehouse", wh)
    (tf, tp, ts)
  }

  private def query(tag: String): org.apache.spark.sql.DataFrame =
    // bad textual order: the unfiltered supplier dim first, the highly
    // selective part filter last
    spark.table(s"$tag.fact")
      .join(spark.table(s"$tag.dimsupp"), col("sk") === col("s_sk"))
      .join(spark.table(s"$tag.dimpart").filter(col("p_size") === 1),
        col("pk") === col("p_pk"))
      .agg(sum("qty").as("total"), count(lit(1)).as("n"))

  private def withCbo[A](body: => A): A = {
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    try body finally {
      spark.conf.set("spark.sql.cbo.enabled", "false")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
    }
  }

  test("analyzed stats reorder the join; un-analyzed keeps the bad order") {
    val wh = Files.createTempDirectory("graft-cbo1-").toString
    val (tf, tp, ts) = mkTables(wh, "gcbo1")
    withCbo {
      // NEUTER CASE (what the q46 gate guards against): without analyze()
      // the optimizer keeps the textual order — unfiltered supplier joins
      // first, the selective part filter last
      val before = leafOrder(query("gcbo1"))
      assert(before == Seq("fact", "dimsupp", "dimpart"),
        s"un-analyzed plan should keep the written order, got $before")
      Seq(tf, tp, ts).foreach(_.analyze(histograms = true, histogramBins = 16))
      val after = leafOrder(query("gcbo1"))
      assert(after == Seq("fact", "dimpart", "dimsupp"),
        s"stats should move the filtered dim innermost, got $after")
      // and the reordered plan computes the same answer
      val r = query("gcbo1").collect()(0)
      // qty of rows with pk % 200 + 1 == filtered part keys (p_size == 1):
      // parts {50k+1}: pk in {1, 51, 101, 151} -> fact ids i where
      // i % 200 + 1 in those -> 4000/200 * 4 = 80 rows
      assert(r.getLong(1) == 80, s"row count: $r")
    }
  }

  test("a pruned-out partition column is not reported for runtime filtering") {
    // The fact scan above projects (pk, sk, qty) — its hash column `id`
    // is pruned. Spark's dynamic-pruning rule resolves filterAttributes
    // against the PRUNED output; reporting `id` threw
    // "Unable to resolve id given [pk,sk,qty]" before the fix.
    val wh = Files.createTempDirectory("graft-cbo2-").toString
    mkTables(wh, "gcbo2")
    val scan = new graft.sources.v2.GraftV2Scan(
      GraftTable.load(spark, s"$wh/fact").meta,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("pk",
          org.apache.spark.sql.types.LongType))),
      Array.empty)
    assert(scan.filterAttributes().isEmpty,
      "a pruned-out hash column must not be offered for runtime filtering")
    // with the key kept, it is offered
    val scan2 = new graft.sources.v2.GraftV2Scan(
      GraftTable.load(spark, s"$wh/fact").meta,
      GraftTable.load(spark, s"$wh/fact").scan().schema, Array.empty)
    assert(scan2.filterAttributes().map(_.fieldNames.head).toSeq == Seq("id"))
  }
}
