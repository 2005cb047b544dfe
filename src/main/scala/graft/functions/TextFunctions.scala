package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text/dedup column builders for the training-data pipeline operators —
 * composed entirely from codegen'd `org.apache.spark.sql.functions`
 * higher-order functions, so everything stays inside whole-stage codegen
 * (no Scala UDFs in the hot path).
 */
object TextFunctions {

  /** Whitespace tokens. */
  def words(text: Column): Column = split(text, " ")

  private def native(e: org.apache.spark.sql.catalyst.expressions.Expression): Column = {
    import org.apache.spark.sql.GraftSqlBridge.toColumn
    toColumn(e)
  }
  private def asExpr(c: Column): org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.GraftSqlBridge.toExpression
    toExpression(c)
  }

  /**
   * Distinct word n-gram shingles (default n=3); unigram fallback for texts
   * shorter than n words. The shingle-set is the dedup unit for MinHash /
   * Jaccard near-dup detection. Single-pass native kernel
   * ([[graft.functions.expressions.WordNGrams]]); [[shinglesComposed]] is
   * the value-identical functions-only form it replaced.
   */
  def shingles(text: Column, n: Int = 3): Column =
    native(graft.functions.expressions.WordNGrams(asExpr(text), n))

  /** ALL n-gram windows in token order (duplicates kept, empty for texts
    * shorter than n words) — `posexplode` over this recovers each gram's
    * token position, which span-level dedup needs and the distinct-set
    * [[shingles]] discards. */
  def shinglesSeq(text: Column, n: Int): Column =
    native(graft.functions.expressions.WordNGramsSeq(asExpr(text), n))

  /** Composed-higher-order-function form of [[shingles]] (kept as the
    * equivalence test oracle — each lambda layer evaluates interpreted). */
  def shinglesComposed(text: Column, n: Int = 3): Column = {
    val w = words(text)
    val grams = transform(sequence(lit(1), size(w) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(k => element_at(w, i + k)): _*))
    when(size(w) >= n, array_distinct(grams)).otherwise(array_distinct(w))
  }

  /** Exact Jaccard similarity of two (already-distinct) shingle arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** Deterministic polynomial string hash in [0, 1e9+7) — codegen'd
    * primitive loop, reproducible in plain SQL for the oracle (see
    * [[graft.functions.expressions.PolyHash64]]). */
  def polyhash(s: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge.{toColumn, toExpression}
    toColumn(graft.functions.expressions.PolyHash64(toExpression(s)))
  }

  /** Modulus shared by every derived hash family. */
  val HashP = 1000000007L

  /** Affine reseed family over [[polyhash]] values: (A(i)*h + B(i)) mod P.
    * A,B < P and h < P, so the products stay < 2^60 (ANSI-safe on Spark,
    * overflow-check-safe on DuckDB int64). */
  def affineA(i: Column): Column = (lit(2654435761L) * (i + 1)) % HashP
  def affineB(i: Column): Column = (lit(2246822519L) * (i + 1)) % HashP
  def affine(h: Column, i: Column): Column =
    (affineA(i) * h + affineB(i)) % HashP

  /** One deterministic hash per shingle. Materialize this in its own
    * projection before [[minhashSignature]] so each *string* is hashed
    * exactly once; the k seeded variants then derive from cheap affine
    * transforms over longs. Native single-pass kernel
    * ([[graft.functions.expressions.PolyHashArray]]). */
  def shingleHashes(shingleSet: Column): Column =
    native(graft.functions.expressions.PolyHashArray(asExpr(shingleSet)))

  /**
   * MinHash signature: k min-hashes over pre-hashed shingles
   * ([[shingleHashes]]), slot i drawn from the affine family
   * (A(i)*h + B(i)) mod p. k = bands * rowsPerBand. Native one-pass kernel
   * ([[graft.functions.expressions.MinHashSig]]); [[minhashSignatureComposed]]
   * is the value-identical functions-only form it replaced.
   */
  def minhashSignature(hashedShingles: Column, k: Int): Column =
    native(graft.functions.expressions.MinHashSig(asExpr(hashedShingles), k))

  /** Composed form of [[minhashSignature]] (equivalence test oracle). */
  def minhashSignatureComposed(hashedShingles: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(hashedShingles, h => affine(h, i))))

  /** LSH band hashes of a minhash signature: bands entries, each hashing
    * `rows` consecutive signature slots. Equal band hash ⇒ candidate pair. */
  def bandHashes(sig: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64(concat_ws(",", slice(sig, b * rows + 1, lit(rows))), b))

  /** Fraction of agreeing minhash slots — an unbiased Jaccard estimate. */
  def minhashAgreement(sigA: Column, sigB: Column): Column =
    aggregate(zip_with(sigA, sigB, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v).cast("double") / size(sigA)

  /** One deterministic hash per word — materialize before [[simhashOf]]
    * (same hash-once reasoning as [[shingleHashes]]). */
  def wordHashes(text: Column): Column =
    native(graft.functions.expressions.PolyHashArray(asExpr(words(text))))

  /** Offset that decorrelates the SimHash bit family from the MinHash
    * slot family (both draw from the same affine reseed). */
  val SimhashSeedOffset = 101

  /**
   * 64-bit SimHash over pre-hashed words: bit j is the majority vote of
   * the parity of affine_{j+offset}(word hash). Near-duplicates have small
   * Hamming distance. Native one-pass kernel
   * ([[graft.functions.expressions.SimHash64]]); [[simhashOfComposed]] is
   * the value-identical functions-only form it replaced.
   */
  def simhashOf(hashes: Column): Column =
    native(graft.functions.expressions.SimHash64(asExpr(hashes)))

  /** Composed form of [[simhashOf]] (equivalence test oracle). Bits combine
    * with OR (bit 63 = Long.MinValue — an additive fold would overflow
    * under ANSI). */
  def simhashOfComposed(hashes: Column): Column =
    aggregate(
      sequence(lit(0), lit(63)),
      lit(0L),
      (acc, bit) => {
        val votes = aggregate(hashes, lit(0),
          (a, h) => a + when(affine(h, bit + SimhashSeedOffset) % 2 === 1, 1)
            .otherwise(-1))
        acc.bitwiseOR(
          when(votes > 0, call_function("shiftleft", lit(1L), bit))
            .otherwise(lit(0L)))
      })

  /** Convenience single-expression simhash (prefer the two-projection form
    * `wordHashes` → `simhashOf` in hot paths). */
  def simhash(text: Column): Column = simhashOf(wordHashes(text))

  /** Hamming distance between two 64-bit simhashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /**
   * Deterministic rolling-hash document fingerprint: fold word codes with
   * h = (h*131 + code) mod 1e9+7 — values stay < 2^63 so ANSI-safe, and the
   * identical fold is expressible in DuckDB (list_reduce) for the oracle.
   */
  def fingerprint(text: Column): Column =
    aggregate(
      transform(words(text), w => (length(w) * 96 + ascii(substring(w, 1, 1))).cast("long")),
      lit(0L),
      (acc, c) => (acc * 131L + c) % 1000000007L)

  // ---- embeddings ----------------------------------------------------

  /** Array<Float> → Array<Double> (cast before multiply so both engines
    * accumulate in double with identical left-to-right order). */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Codegen'd native dot product (see expressions.DotProduct) — identical
    * left-to-right double accumulation to the composed zip_with/aggregate
    * form, so oracle arithmetic is unchanged, but it runs as a primitive
    * loop inside whole-stage codegen instead of interpreted lambdas. */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge.{toColumn, toExpression}
    toColumn(graft.functions.expressions.DotProduct(toExpression(a), toExpression(b)))
  }

  def l2norm(v: Column): Column = sqrt(dot(v, v))

  /** Int8 residual code of `v` against its cell centroid `cv` — the
    * 1-byte-per-dimension PQ sidecar the vector index stores (see
    * expressions.ResidualCode; integer-exact, p15's quantizer). */
  def pqCode(v: Column, cv: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge.{toColumn, toExpression}
    toColumn(graft.functions.expressions.ResidualCode(
      toExpression(v), toExpression(cv)))
  }

  /** ADC dot of a 2^20 fixed-point query vector against an int8 residual
    * code (see expressions.AdcDot) — the code-only candidate ranking. */
  def adcDot(qz: Column, code: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge.{toColumn, toExpression}
    toColumn(graft.functions.expressions.AdcDot(
      toExpression(qz), toExpression(code)))
  }

  /** Cosine similarity of two double arrays. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Fixed-point quantization scale for hyperplane bucketing (2^20): the
    * scale is a power of two, so `x * QuantScale` is an exact double op and
    * `floor` of it is engine-independent — the quantized vector is the same
    * integer sequence in Spark and in the SQL oracle. */
  val QuantScale: Double = (1L << 20).toDouble

  /**
   * Random-hyperplane LSH, multi-table: `tables` independent bucket ids per
   * vector, each the `planes` sign bits of projections onto deterministic
   * pseudo-random hyperplanes (seeded LCG, no runtime RNG — the planes are
   * build-time integer constants inlined into the DuckDB oracle SQL).
   * INTEGER-EXACT: vector quantized to fixed point (floor(x·2^20)), integer
   * plane components, int64 dot products — the bucket sign bit cannot
   * depend on floating-point summation order in either engine. Vectors
   * sharing any table's bucket are ANN candidates — multi-table union is
   * the standard recall lever that a single bucketing lacks.
   */
  def hyperplaneBuckets(v: Column, dim: Int, tables: Int, planes: Int,
      seed: Long = 42L): Column = {
    import org.apache.spark.sql.GraftSqlBridge.{toColumn, toExpression}
    toColumn(graft.functions.expressions.HyperplaneBucketsExpr(
      toExpression(v), dim, tables, planes, seed))
  }

  /** The composed-functions form of [[hyperplaneBuckets]] — per plane, an
    * integer dot of the quantized vector against a literal integer plane.
    * Kept as the executable spec the native kernel is asserted
    * value-identical against. */
  def hyperplaneBucketsComposed(v: Column, dim: Int, tables: Int, planes: Int,
      seed: Long = 42L): Column = {
    val ks = hyperplaneKs(dim, tables, planes, seed)
    val q = transform(v, x => floor(x * QuantScale))
    array((0 until tables).map { t =>
      (0 until planes).map { p =>
        val d = aggregate(zip_with(q, lit(planeKsToInts(ks(t)(p))), (x, w) => x * w),
          lit(0L), (acc, x) => acc + x)
        when(d >= 0, shiftleft(lit(1), p)).otherwise(lit(0))
      }.reduce(_ + _)
    }: _*)
  }

  /** Raw 53-bit LCG draws for every (table, plane, dim) hyperplane
    * component — the shared source for both the Spark literal planes and
    * the oracle SQL literals. */
  def hyperplaneKs(dim: Int, tables: Int, planes: Int,
      seed: Long = 42L): IndexedSeq[IndexedSeq[Array[Long]]] = {
    def lcg(x: Long): Long = x * 6364136223846793005L + 1442695040888963407L
    (0 until tables).map { t =>
      (0 until planes).map { p =>
        var s = lcg(seed + t * planes + p)
        Array.fill(dim) { s = lcg(s); s >>> 11 }
      }
    }
  }

  /** Integer plane components: the top 20 of the 53 LCG bits, centered —
    * values in [-2^19, 2^19), small enough that a dim-64 integer dot
    * against a 2^20-quantized unit-scale vector stays far inside int64. */
  def planeKsToInts(ks: Array[Long]): Array[Long] =
    ks.map(k => (k >>> 33) - (1L << 19))
}
