package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * q33 ordered scan (S12): the global rank must be computed DISTRIBUTED and
 * inside Tungsten — a per-bucket row_number over deterministic key-range
 * buckets plus broadcast prefix-sum offsets (the k-way tablet-merge analog,
 * generic_iterators.cc:109). Guards against the two scale regressions this
 * query has had: a no-partition Window.orderBy (funnels every row through
 * one task) and an RDD zipWithIndex round-trip (abandons codegen).
 */
class OrderedScanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("rank plan: partitioned window, no RDD round-trip, correct ranks") {
    val df = SparkEntry.queries("q33_ordered_scan")(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    // ranks are exactly 1..n in key order
    val byKey = rows.sortBy(_.getLong(0))
    assert(byKey.zipWithIndex.forall { case (r, i) =>
      r.getInt(r.fieldIndex("rn")) == i + 1 })
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ExistingRDD"), s"RDD round-trip in plan:\n$plan")
    // every Window in the plan carries a partition spec (no global window)
    val winLines = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(winLines.nonEmpty)
    assert(winLines.forall(_.contains("_bk#")),
      s"window not partitioned by bucket:\n${winLines.mkString("\n")}")
  }
}
