package graft.functions.expressions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native single-pass kernels for the text-dedup pipeline, replacing chains
 * of interpreted higher-order-function lambdas (`transform`/`aggregate`
 * evaluate their lambda once per element, interpreted) with one compiled
 * per-row call. Arithmetic is IDENTICAL to the composed
 * [[graft.functions.TextFunctions]] forms — the DuckDB oracles replicate
 * that arithmetic, so these must be drop-in value-equal.
 *
 * Codegen calls the expression instance through a reference object (the
 * standard pattern for loop-heavy kernels); the loop itself is plain JIT'd
 * JVM code either way, which is where the win is — the reference gets the
 * same effect from LLVM-compiled row projections (codegen/row_projector.h).
 */
private[expressions] object TextHashing {
  val P: Long = 1000000007L
  def affineA(i: Int): Long = (2654435761L * (i + 1)) % P
  def affineB(i: Int): Long = (2246822519L * (i + 1)) % P
}

/** Array<String> → Array<Long>: [[PolyHash64]] per element (the codegen'd
  * equivalent of `transform(arr, s => polyhash(s))`). Null elements map to
  * null (unreachable from `split` output, kept for type soundness). */
case class PolyHashArray(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_polyhash_array expects array<string>, got ${dt.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType,
    child.dataType.asInstanceOf[ArrayType].containsNull)

  def compute(input: ArrayData): ArrayData = {
    val n = input.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!input.isNullAt(i))
        out(i) = PolyHash64.hash(input.getUTF8String(i).toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("polyHashArray", this, classOf[PolyHashArray].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $self.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): PolyHashArray =
    copy(child = newChild)
}

/**
 * Array<Long> (per-shingle hashes) → Array<Long> (k-slot MinHash signature):
 * slot i = min over hashes h of (A(i)·h + B(i)) mod P — one pass over the
 * hashes with all k mins updated per element, vs the composed
 * `transform(sequence(0,k-1), i -> array_min(transform(hs, h -> affine)))`
 * which is k×n interpreted lambda calls. Value-identical to
 * [[graft.functions.TextFunctions.minhashSignature]].
 */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  import TextHashing._

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash expects array<bigint>, got ${dt.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val as: Array[Long] = Array.tabulate(k)(affineA)
  @transient private lazy val bs: Array[Long] = Array.tabulate(k)(affineB)

  def compute(input: ArrayData): Any = {
    val n = input.numElements()
    if (n == 0) return null // array_min of an empty array is null-ish; unreachable
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!input.isNullAt(i)) {
        val h = input.getLong(i)
        var j = 0
        while (j < k) {
          val v = (as(j) * h + bs(j)) % P
          if (v < out(j)) out(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("minHashSig", this, classOf[MinHashSig].getName)
    nullSafeCodeGen(ctx, ev, a => s"""
       |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.compute($a);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/**
 * Array<Long> (per-word hashes) → 64-bit SimHash: bit j is the majority
 * vote of parity((A(j+101)·h + B(j+101)) mod P) over words — one pass with
 * a votes[64] accumulator, vs 64×n interpreted lambda calls. Bit 63 is the
 * sign bit (1L << 63 = Long.MinValue, matching the composed shiftleft).
 * Value-identical to [[graft.functions.TextFunctions.simhashOf]].
 */
case class SimHash64(child: Expression) extends UnaryExpression {
  import TextHashing._

  /** Same offset as TextFunctions.SimhashSeedOffset — decorrelates the
    * simhash bit family from the minhash slot family. */
  private val SeedOffset = 101

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash expects array<bigint>, got ${dt.catalogString}")
  }

  override def dataType: DataType = LongType

  @transient private lazy val as: Array[Long] = Array.tabulate(64)(j => affineA(j + SeedOffset))
  @transient private lazy val bs: Array[Long] = Array.tabulate(64)(j => affineB(j + SeedOffset))

  def compute(input: ArrayData): Long = {
    val n = input.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!input.isNullAt(i)) {
        val h = input.getLong(i)
        var j = 0
        while (j < 64) {
          if ((as(j) * h + bs(j)) % P % 2 == 1) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var acc = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) acc |= (1L << j)
      j += 1
    }
    acc
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("simHash64", this, classOf[SimHash64].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $self.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/**
 * Array<Double> vector → per-table hyperplane-LSH bucket ids in ONE pass:
 * all `tables`×`planes` projections against a precomputed plane matrix,
 * sign bits packed per table. INTEGER-EXACT: the vector is quantized once
 * to fixed point (floor(x·2^20) — the scale is a power of two, so the
 * multiply is exact and floor is deterministic IEEE), the plane components
 * are integers in [-2^19, 2^19), and the projection is an int64 dot product
 * — no floating-point summation anywhere, so the bucket bit cannot flip if
 * an engine changes its summation order (the round-4 knife edge: the
 * double-dot formulation assumed DuckDB's list_dot_product accumulates
 * strictly left-to-right). Magnitude bound: |q|≤2^20·max|x|, |c|<2^19, so a
 * dim-64 sum stays < 2^46·max|x| — exact in int64 for any |x| < 2^17.
 * Value-identical to the composed form in
 * [[graft.functions.TextFunctions.hyperplaneBucketsComposed]].
 */
case class HyperplaneBucketsExpr(child: Expression, dim: Int, tables: Int,
    planes: Int, seed: Long) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_hyperplane_buckets expects array<double>, got ${dt.catalogString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val mat: Array[Array[Long]] = {
    val ks = graft.functions.TextFunctions.hyperplaneKs(dim, tables, planes, seed)
    Array.tabulate(tables * planes) { i =>
      graft.functions.TextFunctions.planeKsToInts(ks(i / planes)(i % planes))
    }
  }

  def compute(input: ArrayData): ArrayData = {
    val n = math.min(input.numElements(), dim)
    val q = new Array[Long](n)
    var i = 0
    while (i < n) {
      q(i) = math.floor(input.getDouble(i) *
        graft.functions.TextFunctions.QuantScale).toLong
      i += 1
    }
    val out = new Array[Any](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0
      var p = 0
      while (p < planes) {
        val w = mat(t * planes + p)
        var s = 0L
        i = 0
        while (i < n) { s += q(i) * w(i); i += 1 }
        if (s >= 0) bucket |= (1 << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("hyperplaneBuckets", this,
      classOf[HyperplaneBucketsExpr].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $self.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucketsExpr =
    copy(child = newChild)
}

/**
 * String → ALL word n-gram windows in token order (no dedup, no short-text
 * fallback: fewer than n words → empty array). The positional sibling of
 * [[WordNGrams]]: `posexplode` over this yields (token index, gram) pairs,
 * which the span-level dedup operator needs to merge hit windows into
 * maximal duplicated spans — a distinct-set shingling cannot recover
 * positions. Same tokenization (whitespace split keeping empty tokens),
 * same single-space joining.
 */
case class WordNGramsSeq(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles_seq expects string, got ${dt.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  def compute(input: UTF8String): ArrayData = {
    val words = input.toString.split(" ", -1)
    if (words.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](words.length - n + 1)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= words.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("wordNGramsSeq", this, classOf[WordNGramsSeq].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $self.compute($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordNGramsSeq =
    copy(child = newChild)
}

/**
 * String → distinct word n-gram shingles in one pass — the kernel under the
 * dedup operators (the composed form chains split/sequence/transform/
 * concat_ws/array_distinct, each an interpreted lambda layer). Semantics
 * match [[graft.functions.TextFunctions.shingles]] exactly: whitespace
 * split keeping empty tokens (Spark `split(text, " ")` = Java split with
 * limit -1), n-grams joined by a single space, first-occurrence-order
 * distinct, and a distinct-unigram fallback for texts shorter than n words.
 */
case class WordNGrams(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles expects string, got ${dt.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  def compute(input: UTF8String): ArrayData = {
    val words = input.toString.split(" ", -1)
    val out = new mutable.LinkedHashSet[String]
    if (words.length >= n) {
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i <= words.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(words(i + j))
          j += 1
        }
        out += sb.toString
        i += 1
      }
    } else words.foreach(out += _)
    new GenericArrayData(out.toArray.map(s => UTF8String.fromString(s): Any))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("wordNGrams", this, classOf[WordNGrams].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $self.compute($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordNGrams =
    copy(child = newChild)
}
