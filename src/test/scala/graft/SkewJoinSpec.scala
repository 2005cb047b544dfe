package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SkewJoin

/**
 * Hot-key skew mitigation, both layers of q32's posture:
 *  - AQE skew-join splits a hot shuffle PARTITION at runtime (thresholds
 *    lowered here — local data is far below the 256 MB production default);
 *  - [[SkewJoin.saltedEquiJoin]] spreads a hot KEY pre-shuffle, the case
 *    AQE cannot split (all rows of one key share one sort-merge group).
 */
class SkewJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def withConfs[A](kvs: (String, String)*)(body: => A): A = {
    val prev = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  /** ~2/3 of fact rows land on join key 1. */
  private def skewedFact(n: Long): DataFrame =
    spark.range(n).select(
      when(col("id") % 3 =!= 0, lit(1L)).otherwise(col("id")).as("k"),
      (col("id") % 1000).as("v"))

  private def dim(n: Long): DataFrame =
    spark.range(n).select(col("id").as("k"), (col("id") * 2).as("w"))

  test("AQE splits the skewed partition of a hot sort-merge join") {
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16k") {
      // matched rows: 2/3 of the fact lands on hot key 1 (~133,333) plus
      // the id-keyed third whose id < 50,000 (16,667) = 150,000
      val joined = skewedFact(200000L).join(dim(50000L), "k")
      // execute THIS DataFrame (count() would build its own plan and leave
      // joined.queryExecution un-executed / un-adapted)
      assert(joined.collect().length === 150000)
      val adaptive = joined.queryExecution.executedPlan
        .collectFirst { case a: AdaptiveSparkPlanExec => a }
        .getOrElse(fail("no adaptive plan"))
      // descend into query stages by hand: QueryStageExec wraps its plan as
      // a field, not a child, so a plain collect() never sees the join
      def nodes(p: org.apache.spark.sql.execution.SparkPlan):
          Seq[org.apache.spark.sql.execution.SparkPlan] = {
        val inner = p match {
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => nodes(q.plan)
          case _ => Nil
        }
        p +: (p.children.flatMap(nodes) ++ inner)
      }
      val skewJoins = nodes(adaptive.executedPlan).collect {
        case j: SortMergeJoinExec if j.isSkewJoin => j
      }
      assert(skewJoins.nonEmpty,
        s"expected a skew-split sort-merge join, got:\n${adaptive.executedPlan}")
    }
  }

  test("salted inner join equals the plain join result") {
    val fact = skewedFact(5000L)
    val d = dim(100L)
    val plain = fact.join(d, "k").groupBy("k")
      .agg(count(lit(1)).as("n"), sum("w").as("sw"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val salted = SkewJoin.saltedEquiJoin(fact, d, Seq("k"), salts = 8)
      .groupBy("k").agg(count(lit(1)).as("n"), sum("w").as("sw"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted === plain)
  }

  test("salted left_outer preserves unmatched left rows exactly once") {
    val left = Seq((1L, "a"), (2L, "b"), (999L, "miss")).toDF("k", "x")
    val right = Seq((1L, 10L), (2L, 20L)).toDF("k", "w")
    val out = SkewJoin.saltedEquiJoin(left, right, Seq("k"), salts = 4, "left_outer")
      .collect().map(r => (r.getLong(0), r.getString(1), Option(r.get(2)))).toSet
    assert(out === Set((1L, "a", Some(10L)), (2L, "b", Some(20L)), (999L, "miss", None)))
  }

  test("identical hot-key rows spread across salts (row-index tiebreaker)") {
    val salts = 16
    // 10^5 byte-identical rows: the default content hash puts ALL of them
    // in one salt group (deterministic but unspread) ...
    val dup = spark.range(100000L).select(lit(1L).as("k"), lit("same").as("x"))
    val defaultGroups = dup.select(SkewJoin.saltExpr(dup, salts).as("s"))
      .distinct().count()
    assert(defaultGroups == 1)
    // ... the OPT-IN row-index tiebreaker spreads them (input is a range
    // scan — order-stable, the documented precondition)
    val groups = dup
      .select(SkewJoin.saltExpr(dup, salts, rowIndexTiebreaker = true).as("s"))
      .groupBy("s").count().collect()
    assert(groups.length >= salts / 2,
      s"expected >= ${salts / 2} distinct salt groups, got ${groups.length}")
    // and no group holds more than ~2x its fair share
    val maxShare = groups.map(_.getLong(1)).max.toDouble / 100000
    assert(maxShare < 2.0 / salts * 2, s"max salt share $maxShare too hot")
    // correctness unchanged on the duplicated input
    val right = Seq((1L, 10L)).toDF("k", "w")
    val joined = SkewJoin.saltedEquiJoin(dup, right, Seq("k"), salts,
      rowIndexTiebreaker = true)
    assert(joined.count() == 100000L)
    // explicit saltOn override drives the derivation
    val explicitGroups = dup
      .select(SkewJoin.saltExpr(dup, salts, Some(lit(42))).as("s"))
      .distinct().count()
    assert(explicitGroups == 1) // constant expression → one group, by request
  }

  test("salted left_anti and left_semi; right-preserving types rejected") {
    val left = Seq((1L, "a"), (3L, "c")).toDF("k", "x")
    val right = Seq((1L, 10L)).toDF("k", "w")
    val anti = SkewJoin.saltedEquiJoin(left, right, Seq("k"), 4, "left_anti")
      .collect().map(_.getLong(0)).toSet
    assert(anti === Set(3L))
    val semi = SkewJoin.saltedEquiJoin(left, right, Seq("k"), 4, "left_semi")
      .collect().map(_.getLong(0)).toSet
    assert(semi === Set(1L))
    intercept[IllegalArgumentException] {
      SkewJoin.saltedEquiJoin(left, right, Seq("k"), 4, "full_outer")
    }
  }
}
