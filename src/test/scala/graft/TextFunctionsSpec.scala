package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions._

/** Sanity of the dedup/similarity column builders. */
class TextFunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy dog again and once"), // near-dup of 1
    (3L, "completely different words entirely unrelated content here now")
  ).toDF("id", "text")

  test("jaccard of shingle sets separates near-dups from unrelated") {
    val sh = docs.select(col("id"), shingles(col("text")).as("s"))
    val pairs = sh.as("a").join(sh.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"), jaccard(col("a.s"), col("b.s")).as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((1L, 2L)) > 0.6)
    assert(pairs((1L, 3L)) == 0.0)
  }

  test("minhash agreement approximates jaccard; identical texts agree fully") {
    val sh = docs.select(col("id"), shingles(col("text")).as("s"))
      .withColumn("sig", minhashSignature(shingleHashes(col("s")), 96))
    val sigs = sh.select("id", "sig").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(1L))
    val agree12 = sigs(1L).zip(sigs(2L)).count { case (a, b) => a == b } / 96.0
    val agree13 = sigs(1L).zip(sigs(3L)).count { case (a, b) => a == b } / 96.0
    assert(agree12 > 0.4, s"agree12=$agree12")
    assert(agree13 < 0.1, s"agree13=$agree13")
  }

  test("simhash: identical → distance 0, near-dup close, unrelated far") {
    val sh = docs.select(col("id"), simhash(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(1L)) == 0)
    assert(ham(sh(1L), sh(2L)) < ham(sh(1L), sh(3L)))
  }

  test("cosine: orthogonal 0, identical 1") {
    val vs = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)), (3L, Seq(2.0f, 0.0f))
    ).toDF("id", "v").select(col("id"), toDouble(col("v")).as("v"))
    val c = vs.as("a").join(vs.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"), cosine(col("a.v"), col("b.v")).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(math.abs(c((1L, 2L))) < 1e-12)
    assert(math.abs(c((1L, 3L)) - 1.0) < 1e-12)
  }

  test("fingerprint is deterministic and order-sensitive") {
    val fp = Seq((1L, "a b c"), (2L, "a b c"), (3L, "c b a")).toDF("id", "text")
      .select(col("id"), fingerprint(col("text")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
  }

  test("polyhash matches the reference fold (the SQL-oracle contract)") {
    // Same fold DuckDB computes via list_reduce over unicode code points —
    // the cross-engine agreement every minhash/simhash oracle rests on.
    val got = Seq(Tuple1("abc xy")).toDF("s")
      .select(polyhash(col("s"))).head().getLong(0)
    assert(got == 294588010L, s"codegen path: $got")
    assert(graft.functions.expressions.PolyHash64.hash("abc xy") == 294588010L)
    assert(graft.functions.expressions.PolyHash64.hash("") == 0L)
  }

  test("native kernels are value-identical to the composed forms") {
    // The DuckDB oracles replicate the composed arithmetic, so the native
    // one-pass kernels (WordNGrams/PolyHashArray/MinHashSig/SimHash64) must
    // be exact drop-ins — checked on real fixture docs plus edge shapes
    // (short text → unigram fallback, repeated shingles, multiple spaces).
    val edge = Seq((100L, "one"), (101L, "two words"), (102L, "a b a b a b"),
      (103L, "x  double  space")).toDF("id", "text")
    val all = docs.toDF("id", "text").unionByName(edge)
      .unionByName(Tables.raw(spark, "/root/testdata/sf0.001", "documents")
        .select(col("doc_id").as("id"), col("text")))
    val cmp = all.select(
      col("id"),
      shingles(col("text")).as("sh_n"),
      shinglesComposed(col("text")).as("sh_c"),
      simhashOf(wordHashes(col("text"))).as("sim_n"),
      simhashOfComposed(transform(words(col("text")), w => polyhash(w))).as("sim_c"),
      minhashSignature(shingleHashes(shinglesComposed(col("text"))), 96).as("sig_n"),
      minhashSignatureComposed(
        transform(shinglesComposed(col("text")), s => polyhash(s)), 96).as("sig_c"))
    val bad = cmp.filter(
      !(col("sh_n") === col("sh_c")) ||
        col("sim_n") =!= col("sim_c") ||
        !(col("sig_n") === col("sig_c")))
    assert(bad.count() == 0, bad.select("id").limit(5).collect().mkString(","))
  }

  test("shinglesSeq emits every window in token order; empty under n") {
    val edge = Seq((1L, "a b c d"), (2L, "a b"), (3L, "x  y"),
      (4L, "a a a a"), (5L, "")).toDF("id", "text")
    val got = edge.select(col("id"), shinglesSeq(col("text"), 3).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(1L) == Seq("a b c", "b c d"))
    assert(got(2L) == Seq.empty) // shorter than n: NO unigram fallback
    assert(got(3L) == Seq("x  y")) // "" token from the double space survives
    assert(got(4L) == Seq("a a a", "a a a")) // duplicates kept, in order
    assert(got(5L) == Seq.empty)
    // composed positional reference over real fixture docs (n = 8, the
    // span-dedup gram size): transform over an index sequence
    val w = split(col("text"), " ", -1)
    val idx = when(size(w) >= 8, sequence(lit(1), size(w) - 7))
      .otherwise(array().cast("array<int>"))
    val composed = transform(idx, i => concat_ws(" ",
      (0 until 8).map(k => element_at(w, i + k)): _*))
    val bad = Tables.raw(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), shinglesSeq(col("text"), 8).as("n"), composed.as("c"))
      .filter(!(col("n") === col("c")))
    assert(bad.count() == 0, bad.select("doc_id").limit(5).collect().mkString(","))
  }

  test("native hyperplane-bucket kernel matches the composed form") {
    val e = Tables.raw(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val cmp = e.select(col("vec_id"),
      hyperplaneBuckets(col("v"), dim = 64, tables = 16, planes = 6).as("n"),
      hyperplaneBucketsComposed(col("v"), dim = 64, tables = 16, planes = 6).as("c"))
    val bad = cmp.filter(!(col("n") === col("c")))
    assert(bad.count() == 0, bad.select("vec_id").limit(5).collect().mkString(","))
  }

  test("hyperplane plane components are bounded integers (int64-exact dot)") {
    // |c| < 2^19 and |q| <= 2^20 for unit-scale vectors → a dim-64 dot is
    // < 2^45, far inside int64: the bucket sign bit is exact arithmetic in
    // both engines, independent of any float summation order.
    for {
      tbl <- hyperplaneKs(dim = 8, tables = 2, planes = 3)
      plane <- tbl
      c <- planeKsToInts(plane)
    } assert(c >= -(1L << 19) && c < (1L << 19))
  }
}
