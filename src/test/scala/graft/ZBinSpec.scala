package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.expressions.ZBin

/** The Z-order bin kernel (binary-search count of cuts ≤ value): the
  * codegen'd replacement for the interpreted HOF scan must agree with the
  * HOF form on every boundary, in both interpreted and codegen execution. */
class ZBinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def u(s: String) = UTF8String.fromString(s)

  test("bin = count of cuts <= value, every boundary") {
    val cuts = Array("10", "20", "30").map(u)
    assert(ZBin.bin(cuts, u("05")) == 0L)
    assert(ZBin.bin(cuts, u("10")) == 1L) // inclusive at the cut
    assert(ZBin.bin(cuts, u("15")) == 1L)
    assert(ZBin.bin(cuts, u("20")) == 2L)
    assert(ZBin.bin(cuts, u("30")) == 3L)
    assert(ZBin.bin(cuts, u("99")) == 3L)
    assert(ZBin.bin(Array.empty[UTF8String], u("x")) == 0L)
  }

  test("expression agrees with the HOF form across a random domain, nulls bin null") {
    val cuts = (1 to 255).map(q => f"${q * 17 % 997}%04d").distinct.sorted
    val df = spark.range(2000).select(
      when(col("id") % 13 =!= 0, format_string("%04d", pmod(col("id") * 37, lit(997))))
        .as("v"))
    import org.apache.spark.sql.GraftSqlBridge.{toColumn, toExpression}
    val zbin = toColumn(ZBin(toExpression(col("v")), cuts))
    val hof = size(filter(typedLit(cuts), x => col("v") >= x)).cast("long")
    val rows = df.select(
      col("v"), zbin.as("zb"),
      when(col("v").isNull, lit(null)).otherwise(hof).as("ref")).collect()
    rows.foreach { r =>
      if (r.isNullAt(0)) assert(r.isNullAt(1), s"null must bin null: $r")
      else assert(r.getLong(1) == r.getLong(2), s"mismatch: $r")
    }
    // interpreted eval path (no codegen) agrees too
    val e = ZBin(org.apache.spark.sql.catalyst.expressions.Literal(
      UTF8String.fromString("0500"),
      org.apache.spark.sql.types.StringType), cuts)
    assert(e.eval(null) == ZBin.bin(cuts.map(u).toArray, u("0500")))
  }
}
