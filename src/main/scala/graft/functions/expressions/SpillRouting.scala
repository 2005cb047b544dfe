package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native route-id lookup for the merge-on-read SHUFFLE-SPILL overlay
 * (graft.sources.v2.GraftCatalog): route string → dense spill-partition id,
 * unknown routes fold to the fallback id. Replaces a ScalaUDF that paid the
 * catalyst↔scala converter per delta row and broke whole-stage codegen —
 * the degraded spill mode is exactly where a 100 TB table lands when
 * compaction falls behind, so the per-row path matters. O(1) hash lookup on
 * the raw UTF8String (no decode), codegen'd via a referenced constant map.
 */
case class RouteIdLookup(child: Expression, routes: Seq[String], fallbackId: Int)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  @transient private lazy val lookupMap: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer](routes.size * 2)
    routes.zipWithIndex.foreach { case (r, i) =>
      m.put(UTF8String.fromString(r), Integer.valueOf(i))
    }
    m
  }

  def lookup(r: UTF8String): Int = {
    val v = lookupMap.get(r)
    if (v == null) fallbackId else v.intValue()
  }

  override def nullSafeEval(input: Any): Any = lookup(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("routeIdLookup", this,
      classOf[RouteIdLookup].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.lookup($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): RouteIdLookup =
    copy(child = newChild)
}

/**
 * Native candidate fan-out for the spill overlay's coordinate-less files:
 * for each delta row (layout route, encoded first key, op) emit the
 * (spill-partition id, effective op) pairs it must land in —
 *
 *  - untrusted DELETE routes (tombstones on layouts whose route depends on
 *    a non-key column) duplicate into EVERY owned route, dead-set-only;
 *  - otherwise the row lands in its coordinate route (when owned) plus
 *    every bare file whose key interval can contain it; exactly ONE owner
 *    keeps the original op, duplicates become DELETE (dead-set-only), and
 *    a row owned by nothing folds to the fallback route.
 *
 * Interval containment is a binary compare on the order-preserving encoded
 * key (ASCII hex — byte order equals lexicographic order), straight on the
 * UTF8String. Replaces a ScalaUDF returning List[(String, String)] that
 * paid a full catalyst→scala→catalyst round trip per delta row; this emits
 * ArrayData directly and folds the old downstream route→id UDF in, so the
 * explode consumer reads (id, op) structs with zero conversions.
 */
case class SpillCandidates(route: Expression, keyEnc: Expression, op: Expression,
    routes: Seq[String], owned: Seq[String],
    bareIntervals: Seq[(String, String, String)],
    fallback: String, trusted: Boolean, opDelete: String)
    extends TernaryExpression {

  override def first: Expression = route
  override def second: Expression = keyEnc
  override def third: Expression = op

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("rid", IntegerType, nullable = false),
    StructField("op", StringType, nullable = false))), containsNull = false)

  @transient private lazy val idOf: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer](routes.size * 2)
    routes.zipWithIndex.foreach { case (r, i) =>
      m.put(UTF8String.fromString(r), Integer.valueOf(i))
    }
    m
  }
  @transient private lazy val fallbackId: Int = {
    val v = idOf.get(UTF8String.fromString(fallback))
    if (v == null) 0 else v.intValue()
  }
  @transient private lazy val delU: UTF8String = UTF8String.fromString(opDelete)
  // (encodedLo, encodedHi, spill id) with bounds pre-encoded for the binary
  // compare; all-owned ids precomputed for the untrusted-delete fan-out
  @transient private lazy val ivU: Array[(UTF8String, UTF8String, Int)] =
    bareIntervals.map { case (r, lo, hi) =>
      val v = idOf.get(UTF8String.fromString(r))
      (UTF8String.fromString(lo), UTF8String.fromString(hi),
        if (v == null) fallbackId else v.intValue())
    }.toArray
  // membership is tested against the OWNED set (the id space also carries
  // the fallback when nothing is owned — a layout route equal to the
  // fallback string must NOT count as coordinate-owned)
  @transient private lazy val ownedSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](owned.size * 2)
    owned.foreach(r => s.add(UTF8String.fromString(r)))
    s
  }
  // untrusted deletes duplicate into every OWNED route only (none owned →
  // the row is emitted nowhere, exactly as the ScalaUDF's empty list was)
  @transient private lazy val allOwnedDel: ArrayData = new GenericArrayData(
    owned.map { r =>
      val v = idOf.get(UTF8String.fromString(r))
      row(if (v == null) fallbackId else v.intValue(), delU)
    }.toArray[Any])

  private def row(rid: Int, o: UTF8String): GenericInternalRow =
    new GenericInternalRow(Array[Any](rid, o))

  def compute(r: UTF8String, k: UTF8String, o: UTF8String): ArrayData = {
    val isDel = o == delU
    if (isDel && !trusted) return allOwnedDel
    val out = new java.util.ArrayList[Any](4)
    val coordId = if (ownedSet.contains(r)) idOf.get(r) else null
    // the owner (first candidate) keeps the op; duplicates are DELETE
    if (coordId != null) out.add(row(coordId.intValue(), o))
    var i = 0
    while (i < ivU.length) {
      val iv = ivU(i)
      if (iv._1.compareTo(k) <= 0 && k.compareTo(iv._2) <= 0)
        out.add(row(iv._3, if (out.isEmpty) o else delU))
      i += 1
    }
    if (out.isEmpty) out.add(row(fallbackId, o))
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(r: Any, k: Any, o: Any): Any =
    compute(r.asInstanceOf[UTF8String], k.asInstanceOf[UTF8String],
      o.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("spillCandidates", this,
      classOf[SpillCandidates].getName)
    nullSafeCodeGen(ctx, ev, (r, k, o) => s"${ev.value} = $ref.compute($r, $k, $o);")
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): SpillCandidates =
    copy(route = newFirst, keyEnc = newSecond, op = newThird)
}
