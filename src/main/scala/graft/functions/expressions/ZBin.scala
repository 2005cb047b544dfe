package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Equi-depth bin of an order-preserving-encoded value: the count of sorted
 * cut points ≤ the value, by BINARY SEARCH over a per-expression constant
 * array — the Z-order clustering bin kernel (GraftTable.zorderExpr).
 *
 * Exists because the higher-order-function form
 * `size(filter(typedLit(cuts), v >= _))` evaluates an interpreted lambda
 * against all ≤255 cut strings per row, and a clustered rewrite evaluates
 * the Morton code over every row up to three times (cut sampling, range
 * partitioner sampling, shuffle write) — measured 3.1 s → 11.2 s on the
 * q51 gate when the bins moved from doubles to encoded strings. Binary
 * search does ≤8 comparisons instead of 255, codegen'd (the reference
 * keeps per-row kernels in tight native loops for the same reason,
 * e.g. key encoding in common/key_encoder.h).
 *
 * Null input → null (callers coalesce to bin 0 — nulls cluster together).
 */
case class ZBin(child: Expression, cuts: Seq[String]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_zbin expects the encoded string argument, got ${dt.catalogString}")
  }

  override def dataType: DataType = LongType

  @transient private lazy val cutArr: Array[UTF8String] =
    cuts.map(UTF8String.fromString).toArray

  override def nullSafeEval(input: Any): Any =
    ZBin.bin(cutArr, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val arr = ctx.addReferenceObj("zbinCuts", cutArr,
      "org.apache.spark.unsafe.types.UTF8String[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.expressions.ZBin.bin($arr, $v);")
  }

  override protected def withNewChildInternal(newChild: Expression): ZBin =
    copy(child = newChild)
}

object ZBin {
  /** Count of cuts ≤ v (cuts sorted ascending, distinct). */
  def bin(cuts: Array[UTF8String], v: UTF8String): Long = {
    var lo = 0
    var hi = cuts.length // exclusive; invariant: cuts(<lo) <= v < cuts(>=hi)
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cuts(mid).compareTo(v) <= 0) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }
}
