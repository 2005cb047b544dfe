package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.HashComponent
import graft.table.GraftTable

/**
 * Budgeted maintenance policy (the reference's compaction-policy scoring
 * under an I/O budget, compaction_policy.h:50-60): the plan is computed
 * from METADATA alone, candidates are scored by benefit-per-I/O, and
 * maintain(ioBudgetBytes) executes greedily inside the budget — the most
 * delta-pressured tablet folds first, barely-dirty tablets wait.
 */
class MaintenancePlanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("plan scores dirty tablets above clean ones; budget executes greedily") {
    val wh = Files.createTempDirectory("graft-mplan-").toString
    val df = (1 to 800).map(i => (i.toLong, s"a$i")).toDF("k", "v")
    val t = GraftTable.create(spark, s"$wh/mp", "mp", df.schema, Seq("k"),
      Seq(HashComponent(Seq("k"), 4)), data = Some(df))
    // upsert ~80% of all rows (spread over buckets), flush so the delta
    // files carry tablet coordinates (the plan reads metadata only), then
    // a tiny second wave into a single key and flush again — buckets now
    // differ in routed delta bytes and therefore in score
    t.upsert(df.filter(col("k") % 5 =!= 0).withColumn("v", lit("wave1")))
    t.compactDeltas()
    t.upsert(Seq((1L, "wave2")).toDF("k", "v"))
    t.compactDeltas()
    val plan = t.maintenancePlan()
    assert(plan.nonEmpty)
    assert(plan == plan.sortBy(-_.score), "plan must be sorted by score")
    assert(plan.forall(_.kind == "compact_tablet"))
    assert(plan.forall(_.ioBytes > 0))
    // every delta-carrying tablet is a candidate
    val routedTablets = t.meta.deltaFiles
      .filter(f => f.bucket.isDefined || f.rangeKey.isDefined)
      .map(f => (f.bucket, f.rangeKey)).distinct.toSet
    assert(plan.map(a => (a.bucket, a.rangeKey)).toSet == routedTablets)

    // budget for exactly the top action: only it runs
    val top = plan.head
    val ran = t.maintain(ioBudgetBytes = top.ioBytes)
    assert(ran.map(a => (a.bucket, a.rangeKey)) == Seq((top.bucket, top.rangeKey)),
      s"expected only the top-scored tablet, ran $ran")
    // that tablet's routed deltas are gone; others remain
    val left = t.meta.deltaFiles.map(f => (f.bucket, f.rangeKey)).distinct.toSet
    assert(!left.contains((top.bucket, top.rangeKey)))
    assert(left.nonEmpty, "the budget must not have paid for other tablets")
    // a large budget clears the rest; the table state is unchanged
    assert(t.maintain(ioBudgetBytes = Long.MaxValue).nonEmpty)
    assert(t.meta.deltaFiles.isEmpty)
    val got = t.scan().collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == 800 && got(1L) == "wave2" && got(5L) == "a5" &&
      got(2L) == "wave1")
    // nothing left to plan
    assert(t.maintenancePlan().isEmpty)
  }

  test("fragmented unrouted tail plans a merge_tail action") {
    val wh = Files.createTempDirectory("graft-mplan2-").toString
    val df = (1 to 100).map(i => (i.toLong, s"a$i")).toDF("k", "v")
    val t = GraftTable.create(spark, s"$wh/mp2", "mp2", df.schema, Seq("k"),
      Seq(HashComponent(Seq("k"), 2)), data = Some(df))
    (1 to 5).foreach(i => t.upsert(Seq((i.toLong, s"u$i")).toDF("k", "v")))
    val plan = t.maintenancePlan()
    assert(plan.map(_.kind) == Seq("merge_tail"), plan.toString)
    val ran = t.maintain(ioBudgetBytes = Long.MaxValue)
    assert(ran.map(_.kind) == Seq("merge_tail"))
    assert(t.meta.deltaFiles.count(
      f => f.bucket.isEmpty && f.rangeKey.isEmpty) == 1)
    // SQL surface: the plan report comes back through CALL
    spark.conf.set("spark.sql.catalog.gmp2", classOf[graft.sources.v2.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gmp2.warehouse", wh)
    t.upsert(Seq((1L, "x1")).toDF("k", "v"))
    (2 to 5).foreach(i => t.upsert(Seq((i.toLong, s"x$i")).toDF("k", "v")))
    val rows = spark.sql(s"CALL gmp2.system.maintenance_plan('mp2')").collect()
    assert(rows.nonEmpty && rows.head.getString(0) == "merge_tail" &&
      rows.head.getLong(3) > 0)
  }

  test("warehouse budget ranks across tables: the globally dirtiest folds first") {
    val wh = Files.createTempDirectory("graft-mplan3-").toString
    def mk(name: String, rows: Int, upsertFrac: Int): GraftTable = {
      val df = (1 to rows).map(i => (i.toLong, s"a$i")).toDF("k", "v")
      val t = GraftTable.create(spark, s"$wh/$name", name, df.schema, Seq("k"),
        Seq(HashComponent(Seq("k"), 2)), data = Some(df))
      t.upsert(df.filter(col("k") % upsertFrac === 0).withColumn("v", lit("u")))
      t.compactDeltas() // flush -> coordinated delta files (metadata plan)
      t
    }
    val dirty = mk("wdirty", 400, 2)  // half the rows carry deltas
    val clean = mk("wclean", 400, 50) // 2% carry deltas
    // budget sized for ONE tablet fold: it must come from the dirty table
    val firstPlan = graft.tools.GraftTools
      .maintainWarehouseBudgeted(spark, wh, ioBudgetBytes = 0) // plan only probe
    assert(firstPlan.isEmpty)
    val top = dirty.maintenancePlan().head
    val ran = graft.tools.GraftTools
      .maintainWarehouseBudgeted(spark, wh, ioBudgetBytes = top.ioBytes)
    assert(ran.nonEmpty && ran.forall(_._1 == "wdirty"),
      s"the globally dirtiest tablet must fold first: $ran")
    assert(clean.meta.deltaFiles.nonEmpty, "the barely-dirty table must wait")
    // full budget clears the warehouse; states intact
    graft.tools.GraftTools.maintainWarehouseBudgeted(spark, wh, Long.MaxValue)
    assert(dirty.meta.deltaFiles.isEmpty && clean.meta.deltaFiles.isEmpty)
    assert(dirty.scan().filter(col("v") === "u").count() == 200)
    assert(clean.scan().filter(col("v") === "u").count() == 8)
  }
}
