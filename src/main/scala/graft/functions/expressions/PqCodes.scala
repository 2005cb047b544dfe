package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, LongType}

/**
 * Product-quantization kernels for the persisted vector index
 * (tools/VectorIndex): the residual scalar quantizer p15 computes
 * in-query, promoted to codegen'd expressions so the index can STORE the
 * 1-byte-per-dimension codes and probe them without touching raw
 * vectors. At 100 TB this is what makes the candidate stage RAM-resident:
 * a 64-dim float vector is 512 B, its code is 64 B, and the approximate
 * ranking reads codes only — raw vectors load for the top-R survivors'
 * exact re-rank alone.
 *
 * Integer-exact end to end (same contract as p15): the residual code is
 * `clamp(floor((v_i − c_i) · 64), ±127)` per dimension, and the ADC score
 * against a 2^20 fixed-point query adds `(qz · code) · 2^14` to the
 * query-centroid dot — all int64 arithmetic, no float-summation knife
 * edge, deterministic across engines and runs.
 */

/** `graft_pq_code(v, cv) → binary`: the int8 residual code of vector `v`
  * against its cell centroid `cv`, one signed byte per dimension. */
case class ResidualCode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_pq_code expects two array<double> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = BinaryType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val c = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), c.numElements())
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val r = math.floor((x.getDouble(i) - c.getDouble(i)) * 64.0)
      out(i) = math.max(-127.0, math.min(127.0, r)).toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, c) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val r = ctx.freshName("r")
      val out = ctx.freshName("out")
      s"""
         |int $n = Math.min($a.numElements(), $c.numElements());
         |byte[] $out = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  double $r = Math.floor(($a.getDouble($i) - $c.getDouble($i)) * 64.0);
         |  $out[$i] = (byte) Math.max(-127.0, Math.min(127.0, $r));
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ResidualCode =
    copy(left = newLeft, right = newRight)
}

/** `graft_adc_dot(qz, code) → long`: asymmetric-distance dot of a 2^20
  * fixed-point query vector against an int8 residual code. */
case class AdcDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_adc_dot expects (array<bigint>, binary), got " +
          s"${l.catalogString} and ${r.catalogString}")
    }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val q = a.asInstanceOf[ArrayData]
    val code = b.asInstanceOf[Array[Byte]]
    val n = math.min(q.numElements(), code.length)
    var s = 0L
    var i = 0
    while (i < n) { s += q.getLong(i) * code(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, code) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = Math.min($q.numElements(), $code.length);
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $q.getLong($i) * $code[$i];
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcDot =
    copy(left = newLeft, right = newRight)
}
