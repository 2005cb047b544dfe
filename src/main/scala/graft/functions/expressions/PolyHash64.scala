package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Deterministic polynomial string hash: fold over Unicode code points with
 * h = (h * 131 + cp) mod 1e9+7.
 *
 * This is the base hash under the MinHash / SimHash dedup operators. Unlike
 * xxhash64 it is reproducible in plain SQL (DuckDB:
 * `list_reduce(list_prepend(0, list_transform(string_split(s,''), c ->
 * unicode(c))), (acc,c) -> (acc*131+c) % 1000000007)`), which makes the
 * whole near-dup pipeline oracle-checkable end to end. Values stay in
 * [0, 1e9+7) so any downstream affine reseeding `(a*h+b) mod p` fits in
 * int64 without ANSI overflow on either engine.
 *
 * Codegen'd primitive loop (same rationale as [[DotProduct]]): the per-row
 * kernel stays inside whole-stage codegen instead of interpreted
 * higher-order-function lambdas.
 */
case class PolyHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_polyhash expects a string argument, got ${dt.catalogString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    PolyHash64.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val str = ctx.freshName("str")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
         |java.lang.String $str = $s.toString();
         |long $h = 0L;
         |int $i = 0;
         |while ($i < $str.length()) {
         |  int $cp = $str.codePointAt($i);
         |  $h = ($h * 131L + (long) $cp) % 1000000007L;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash64 =
    copy(child = newChild)
}

object PolyHash64 {
  val P: Long = 1000000007L

  def hash(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 131L + cp) % P
      i += Character.charCount(cp)
    }
    h
  }
}
