package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.expressions.{RouteIdLookup, SpillCandidates}

/**
 * Unit parity for the native spill-routing expressions (the ScalaUDF
 * replacements on the merge-on-read shuffle-spill path): interpreted eval
 * vs whole-stage-codegen DataFrame evaluation must agree, and the edge
 * cases the old UDFs defined must hold exactly — a layout route equal to
 * the fallback STRING never counts as coordinate-owned, untrusted deletes
 * fan into every owned route (and nowhere when none are owned), interval
 * containment is inclusive on both encoded bounds, and the owner (first
 * candidate) keeps the op while duplicates become DELETE.
 */
class SpillRoutingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import org.apache.spark.sql.GraftSqlBridge.{toColumn, toExpression}

  private val routes = Seq("b:0", "b:1", "f:x")
  private val owned = Seq("b:0", "b:1", "f:x")
  private val iv = Seq(("f:x", "0005", "0009"))

  private def candCol(trusted: Boolean, rts: Seq[String] = routes,
      own: Seq[String] = owned) =
    toColumn(SpillCandidates(toExpression(col("r")), toExpression(col("k")),
      toExpression(col("o")), rts, own, iv, fallback = "b:0",
      trusted = trusted, opDelete = "D"))

  private def run(rows: Seq[(String, String, String)], trusted: Boolean,
      rts: Seq[String] = routes, own: Seq[String] = owned) =
    rows.toDF("r", "k", "o")
      .select(col("r"), explode(candCol(trusted, rts, own)).as("c"))
      .select(col("c.rid"), col("c.op"))
      .collect().map(x => (x.getInt(0), x.getString(1))).toSeq

  test("owner keeps the op, interval duplicates become DELETE, bounds inclusive") {
    // coord-owned upsert also inside f:x's interval: b:1 owns U, f:x gets D
    assert(run(Seq(("b:1", "0007", "U")), trusted = true) ==
      Seq((1, "U"), (2, "D")))
    // both interval endpoints are IN
    assert(run(Seq(("zz", "0005", "U")), trusted = true) == Seq((2, "U")))
    assert(run(Seq(("zz", "0009", "U")), trusted = true) == Seq((2, "U")))
    // just outside either bound and not owned: the fallback takes the op
    assert(run(Seq(("zz", "0004", "U")), trusted = true) == Seq((0, "U")))
    assert(run(Seq(("zz", "000A", "U")), trusted = true) == Seq((0, "U")))
    // trusted DELETE: every candidate is a delete (op is already D)
    assert(run(Seq(("b:1", "0007", "D")), trusted = true) ==
      Seq((1, "D"), (2, "D")))
  }

  test("untrusted DELETE fans into every owned route; none owned = nowhere") {
    assert(run(Seq(("b:1", "0007", "D")), trusted = false).toSet ==
      Set((0, "D"), (1, "D"), (2, "D")))
    // upserts are unaffected by trust (full rows carry exact routes)
    assert(run(Seq(("b:1", "0001", "U")), trusted = false) == Seq((1, "U")))
    // zero owned routes: the delete is emitted NOWHERE (the old UDF's
    // empty list — the fallback id space still exists but owns nothing)
    assert(run(Seq(("b:0", "0007", "D")), trusted = false,
      rts = Seq("b:0"), own = Nil).isEmpty)
  }

  test("a route equal to the fallback string is not coordinate-owned unless listed") {
    // id space = Seq(fallback) but owned = Nil (the owned-empty layout):
    // a row whose layout route EQUALS the fallback string must not count
    // as coord-owned — it falls through to intervals, then fallback
    assert(run(Seq(("b:0", "0001", "U")), trusted = true,
      rts = Seq("b:0"), own = Nil) == Seq((0, "U")))
  }

  test("RouteIdLookup: O(1) dense ids, unknown routes fold to fallback; codegen == eval") {
    val idCol = toColumn(RouteIdLookup(toExpression(col("r")), routes, 0))
    val got = Seq("b:0", "b:1", "f:x", "nope").toDF("r")
      .select(col("r"), idCol.as("id")).collect()
      .map(x => x.getString(0) -> x.getInt(1)).toMap
    assert(got == Map("b:0" -> 0, "b:1" -> 1, "f:x" -> 2, "nope" -> 0))
    // interpreted eval agrees with the codegen'd frame above
    val e = RouteIdLookup(
      org.apache.spark.sql.catalyst.expressions.Literal("f:x"), routes, 0)
    assert(e.eval(null) == 2)
  }
}
