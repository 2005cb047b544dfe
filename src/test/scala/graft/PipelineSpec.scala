package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions.{cosine, dot, toDouble}

/**
 * Value-level guards for the pipeline operators that the DuckDB oracle
 * cannot express (the KMeans-trained ANN variant) or that rest on a
 * documented numeric tolerance (the cosine-threshold knife edge).
 */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** All-pairs exact cosine top-`k` neighbor sets per query — the ground
    * truth an approximate ANN variant is recalled against. */
  private def bruteTopK(dir: String, nQueries: Int, k: Int): Map[Long, Set[Long]] = {
    val v = toDouble(col("embedding"))
    val e = Tables.scan(spark, dir, "embeddings")
      .select(col("vec_id"), v.as("v"))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("c").desc, col("neighbor_id"))
    q.join(e, col("query_id") =!= col("vec_id"))
      .withColumn("c", cosine(col("qv"), col("v")))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("c"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
  }

  test("ivfKMeansTopK: seed-fixed recall@3 vs the brute-force answer") {
    // The KMeans-trained IVF quantizer is not oracle-reproducible
    // (iterative fit), so its gate is the standard ANN one: recall against
    // the exact all-pairs top-k. Seed is fixed in the implementation
    // (KMeans setSeed(42)), so this is deterministic per corpus.
    val dir = "/root/testdata/sf0.001"
    val truth = bruteTopK(dir, nQueries = 32, k = 3)
    val got = Pipeline.ivfKMeansTopK(spark, dir, k = 16, nProbe = 4, topK = 3)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    assert(got.keySet == truth.keySet, "every query must answer")
    val hits = truth.toSeq.map { case (q, t) => (got(q) & t).size }.sum
    val recall = hits.toDouble / truth.valuesIterator.map(_.size).sum
    // The synthetic corpus is weakly clustered, so absolute recall is
    // modest; what the gate detects is a BROKEN quantizer. Chance for
    // nProbe=4 of k=16 cells is 0.25; the seeded measurement here is
    // 0.604 (and rises to 1.0 by nProbe=8 — the probe ladder behaves).
    // Gate midway at 0.45: a cells-gone-garbage regression collapses to
    // ~chance and fails loudly.
    assert(recall >= 0.45, f"recall@3 $recall%.3f below the 0.45 gate")
    Pipeline.releaseCaches()
  }

  test("cosine threshold margin: no pair sits within eps of CosineT (p5/p24 knife edge)") {
    // p5/p24's engine/oracle parity compares double-dot cosines against
    // CosineT in BOTH engines with identical left-to-right 64-term
    // summation. That is exact UNLESS a pair's cosine lands within
    // double-rounding distance of the threshold — then the two engines
    // could disagree on >=. This asserts the gated corpora keep a real
    // margin (1e-9, ~1e6 x the worst-case 64-term accumulation ulp), so
    // the tolerance documented at p13/p24 is a fact, not a hope.
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val v = toDouble(col("embedding"))
      val e = Tables.scan(spark, dir, "embeddings").select(col("vec_id"), v.as("v"))
      val minMargin = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
        .select(abs(cosine(col("a.v"), col("b.v")) - lit(Pipeline.CosineT)).as("m"))
        .agg(min(col("m"))).head.getDouble(0)
      assert(minMargin > 1e-9,
        f"$dir: a pair's cosine sits $minMargin%.2e from CosineT — " +
          "the oracle compare is on a knife edge")
    }
  }
}
