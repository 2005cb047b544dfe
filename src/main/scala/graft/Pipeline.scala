package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/**
 * Training-data pipeline operators over the documents/embeddings tables —
 * the LLM-pipeline surface (SURVEY.md §7.2 step 9): dedup (exact, MinHash+LSH
 * banding, SimHash, n-gram Jaccard, embedding cosine), similarity search
 * (brute-force + hyperplane-LSH ANN), and text analysis (language-ID,
 * quality stats, token counts, fingerprinting).
 *
 * Scale design: every near-dup op is LSH-prefiltered (candidates from band
 * buckets, not an O(n²) self-join), so the expensive exact verification runs
 * only on candidate pairs — the layout that survives 100 TB. The DuckDB
 * oracles compute the exact O(n²) answer, which the LSH path must reproduce
 * (32 bands × 3 rows ⇒ pair-miss probability at j≥0.8 is ~1e-10).
 */
object Pipeline {

  private val MinhashK = 96
  private val Bands = 32
  private val Rows = 3
  private val JaccardT = 0.8
  private val CosineT = 0.45
  private val SimhashMaxHamming = 8
  private val LshTables = 4
  private val LshPlanes = 6

  private def parallelism(s: SparkSession): Int =
    s.sparkContext.defaultParallelism

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.scan(s, dir, "documents")
  private def embs(s: SparkSession, dir: String): DataFrame =
    Tables.scan(s, dir, "embeddings")

  /** Shingle sets per doc (cached shape shared by the dedup ops). The
    * repartition spreads the interpreted higher-order-function work — the
    * documents table is one small file, which would otherwise hash on a
    * single task. */
  private def docShingles(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).repartition(parallelism(s))
      .select(col("doc_id"), shingles(col("text")).as("sh"))

  /**
   * doc_id → minhash signature, computed ONCE and cached: the 96-hash
   * signature is the expensive expression, and it feeds band explosion,
   * both sides of the candidate self-join, and the estimate join — without
   * the cache Spark would re-evaluate it per consumer.
   */
  private def cachedSignatures(s: SparkSession, dir: String): DataFrame = {
    // Persist the per-shingle hashes BEFORE deriving the 96 seeded variants:
    // the cache is a materialization barrier, so CollapseProject cannot
    // inline the string-hashing back into the k-times-evaluated lambda
    // (higher-order functions are interpreted — re-hashing strings k× per
    // row is the difference between seconds and minutes at 5k docs).
    val hs = docShingles(s, dir)
      .select(col("doc_id"), shingleHashes(col("sh")).as("hs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    hs.select(col("doc_id"), minhashSignature(col("hs"), MinhashK).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  /** LSH candidate pairs (id_a < id_b) from minhash band buckets. */
  private def lshCandidates(sig: DataFrame): DataFrame = {
    val bands = sig.select(col("doc_id"),
        posexplode(bandHashes(col("sig"), Bands, Rows)).as(Seq("band", "bh")))
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
  }

  /** vec_id → L2-normalized double vector, so the O(n²) pair stage is a dot
    * product only (norms computed once per vector, not per pair). */
  private def normalizedVecs(s: SparkSession, dir: String): DataFrame = {
    val v = toDouble(col("embedding"))
    embs(s, dir).select(col("vec_id"),
      zip_with(v, array_repeat(l2norm(v), 64), (x, n) => x / n).as("v"))
  }

  /**
   * KMeans-trained coarse-quantizer IVF (library API, same plan shape as
   * the p13 medoid-sampled query — the quantizer is the only difference).
   * Not a declared query because iterative KMeans isn't reproducible in the
   * SQL oracle; covered by its own spec instead.
   */
  def ivfKMeansTopK(s: SparkSession, dir: String, k: Int = 16,
      nProbe: Int = 2, topK: Int = 3): DataFrame = {
    import s.implicits._
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val e = normalizedVecs(s, dir)
      .withColumn("fv", array_to_vector(col("v")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val model = new KMeans().setK(k).setSeed(42).setMaxIter(5)
      .setFeaturesCol("fv").fit(e)
    val assigned = model.transform(e)
      .select(col("vec_id"), col("v"), col("prediction").as("cell"))
    val cents = model.clusterCenters.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toArray) }.toDF("cell", "cv")
    val q = assigned.filter(col("vec_id") < 32)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val wCell = Window.partitionBy(col("query_id")).orderBy(col("cd").desc, col("cell"))
    val probeCells = q.crossJoin(broadcast(cents))
      .withColumn("cd", dot(col("qv"), toDouble(col("cv"))))
      .withColumn("cr", row_number().over(wCell)).filter(col("cr") <= nProbe)
      .select("query_id", "qv", "cell")
    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("c").desc, col("neighbor_id"))
    probeCells.join(assigned, "cell")
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("c", dot(col("qv"), col("v")))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("c"))
      .withColumn("rank", row_number().over(wRank)).filter(col("rank") <= topK)
      .select("query_id", "neighbor_id", "rank")
      .orderBy("query_id", "rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p1_dedup_exact" -> ((s, dir) => {
      // Exact dedup: keep the lowest doc_id per identical text (hash-groupBy;
      // at scale group on sha2(text) so the shuffle key is 32 bytes, not the
      // document).
      docs(s, dir)
        .groupBy(sha2(col("text").cast("binary"), 256).as("h"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .select("keep_id", "n_copies")
        .orderBy("keep_id")
    }),

    "p2_dedup_ngram" -> ((s, dir) => {
      // Near-dup pairs by exact word-3-gram Jaccard >= 0.8, LSH-prefiltered.
      val sh = docShingles(s, dir)
      lshCandidates(cachedSignatures(s, dir))
        .join(sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), "id_a")
        .join(sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), "id_b")
        .filter(jaccard(col("sh_a"), col("sh_b")) >= JaccardT)
        .select("id_a", "id_b")
        .orderBy("id_a", "id_b")
    }),

    "p3_dedup_minhash" -> ((s, dir) => {
      // MinHash signature agreement (Jaccard estimate) on LSH candidates.
      // Oracle-exact: the banding has GUARANTEED recall at this threshold —
      // est_j >= 0.7 means <= 28 of 96 slots disagree, and 28 mismatches
      // can break at most 28 of the 32 bands, so at least one band always
      // matches. The LSH output therefore equals the O(n²)-over-signatures
      // answer the oracle computes, deterministically (not just w.h.p.).
      val sig = cachedSignatures(s, dir)
      lshCandidates(sig)
        .join(sig.select(col("doc_id").as("id_a"), col("sig").as("sig_a")), "id_a")
        .join(sig.select(col("doc_id").as("id_b"), col("sig").as("sig_b")), "id_b")
        .withColumn("est_j", minhashAgreement(col("sig_a"), col("sig_b")))
        .filter(col("est_j") >= 0.7)
        .select("id_a", "id_b", "est_j")
        .orderBy("id_a", "id_b")
    }),

    "p4_dedup_simhash" -> ((s, dir) => {
      // 64-bit SimHash; near-dups = Hamming distance <= 8. Self-join on the
      // 8-bit prefix blocks the O(n²) (same-prefix requirement is implied at
      // distance<=8 only probabilistically, so full cross within blocks of
      // the two prefix halves — here: plain join, small n; scale path =
      // multi-index blocking).
      // Same materialization-barrier trick as cachedSignatures: word hashes
      // cached once, then the 64-bit vote fold runs over longs only.
      val wh = docs(s, dir).repartition(parallelism(s))
        .select(col("doc_id"), wordHashes(col("text")).as("wh"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val sh = wh.select(col("doc_id"), simhashOf(col("wh")).as("sh"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      sh.repartition(parallelism(s)).as("a")
        .join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
        .withColumn("dist", hamming64(col("a.sh"), col("b.sh")))
        .filter(col("dist") <= SimhashMaxHamming)
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
          col("dist").cast("int").as("dist"))
        .orderBy("id_a", "id_b")
    }),

    "p5_dedup_embed" -> ((s, dir) => {
      // Embedding cosine near-dup pairs (threshold 0.45 — the data's planted
      // separation). Vectors are L2-normalized once, so the O(n²) pair stage
      // is a single dot product. Brute-force at test SF; the LSH-bucketed
      // variant below is the scale path.
      // Repartition the probe side: nested-loop pair-join parallelism equals
      // stream-side partition count (a single input file would run 1 task).
      val e = normalizedVecs(s, dir)
      e.repartition(parallelism(s)).as("a")
        .join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
        .filter(dot(col("a.v"), col("b.v")) >= CosineT)
        .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
        .orderBy("id_a", "id_b")
    }),

    "p6_ann_topk" -> ((s, dir) => {
      // Brute-force cosine top-10 for query vectors vec_id < 8
      // (pre-normalized → dot product per pair).
      val e = normalizedVecs(s, dir)
      val q = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("v").as("qv"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("c").desc, col("neighbor_id"))
      q.join(e.repartition(parallelism(s)), col("query_id") =!= col("vec_id"))
        .withColumn("c", dot(col("qv"), col("v")))
        .select(col("query_id"), col("vec_id").as("neighbor_id"), col("c"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .select("query_id", "neighbor_id", "rank")
        .orderBy("query_id", "rank")
    }),

    "p7_ann_lsh" -> ((s, dir) => {
      // Multi-table hyperplane-LSH ANN (scale path): 4 independent 6-bit
      // bucketings; a vector is a candidate for a query if they share ANY
      // table's bucket (union-of-tables is the standard recall lever);
      // top-3 per query by exact cosine over the candidate set. The oracle
      // replicates the identical approximation — the hyperplanes are
      // build-time dyadic constants inlined into the SQL — so the result is
      // hash-checkable even though the operator is approximate vs. p6.
      val e = embs(s, dir).select(col("vec_id"),
          toDouble(col("embedding")).as("v"))
        .withColumn("bks",
          hyperplaneBuckets(col("v"), dim = 64, tables = LshTables, planes = LshPlanes))
      val flat = e.select(col("vec_id"), col("v"),
        posexplode(col("bks")).as(Seq("t", "bk")))
      val q = flat.filter(col("vec_id") < 32)
        .select(col("vec_id").as("query_id"), col("v").as("qv"),
          col("t").as("qt"), col("bk").as("qbk"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("c").desc, col("neighbor_id"))
      q.join(flat.repartition(parallelism(s), col("t"), col("bk")),
          col("qt") === col("t") && col("qbk") === col("bk") &&
            col("query_id") =!= col("vec_id"))
        .select(col("query_id"), col("qv"),
          col("vec_id").as("neighbor_id"), col("v"))
        .dropDuplicates("query_id", "neighbor_id")
        .withColumn("c", cosine(col("qv"), col("v")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select("query_id", "neighbor_id", "rank")
        .orderBy("query_id", "rank")
    }),

    "p13_ann_ivf" -> ((s, dir) => {
      // IVF-style ANN (the second scale path besides hyperplane LSH): a
      // coarse quantizer assigns every vector to its nearest centroid cell;
      // each query probes its 2 nearest cells and ranks top-3 by cosine
      // within them — the candidate set is ~2/k of the data instead of all
      // of it. Centroids here are a deterministic medoid sample
      // (vec_id % 31 == 5 → n/31 cells, k scaling with √n̄-ish), which the
      // oracle replicates exactly in SQL; the KMeans-trained quantizer
      // variant is [[ivfKMeansTopK]] (same plan shape, centroids fit
      // instead of sampled).
      val e = normalizedVecs(s, dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cents = e.filter(col("vec_id") % 31 === 5)
        .select(col("vec_id").as("cell"), col("v").as("cv"))
      val wAsg = Window.partitionBy(col("vec_id"))
        .orderBy(col("d").desc, col("cell"))
      val assigned = e.repartition(parallelism(s))
        .crossJoin(broadcast(cents))
        .withColumn("d", dot(col("v"), col("cv")))
        .withColumn("r", row_number().over(wAsg)).filter(col("r") === 1)
        .select("vec_id", "v", "cell")
      val wProbe = Window.partitionBy(col("query_id"))
        .orderBy(col("d").desc, col("cell"))
      val probeCells = e.filter(col("vec_id") < 32)
        .select(col("vec_id").as("query_id"), col("v").as("qv"))
        .crossJoin(broadcast(cents))
        .withColumn("d", dot(col("qv"), col("cv")))
        .withColumn("r", row_number().over(wProbe)).filter(col("r") <= 2)
        .select("query_id", "qv", "cell")
      val wRank = Window.partitionBy(col("query_id"))
        .orderBy(col("c").desc, col("neighbor_id"))
      probeCells.join(assigned, "cell")
        .filter(col("query_id") =!= col("vec_id"))
        .withColumn("c", dot(col("qv"), col("v")))
        .select(col("query_id"), col("vec_id").as("neighbor_id"), col("c"))
        .withColumn("rank", row_number().over(wRank)).filter(col("rank") <= 3)
        .select("query_id", "neighbor_id", "rank")
        .orderBy("query_id", "rank")
    }),

    "p8_text_stats" -> ((s, dir) => {
      // Quality-scoring stats: word/char counts, stopword ratio, punct count.
      val w = words(col("text"))
      val stops = size(filter(w, x => x.isin("the", "a", "and", "of")))
      docs(s, dir).select(
        col("doc_id"),
        size(w).as("n_words"),
        length(col("text")).as("n_chars"),
        stops.as("stop_cnt"),
        (stops.cast("double") / size(w)).as("stop_ratio"),
        (length(col("text")) - length(regexp_replace(col("text"), "[.,!?]", "")))
          .as("punct_cnt"))
        .orderBy("doc_id")
    }),

    "p9_lang_id" -> ((s, dir) => {
      // Marker-word language ID (n-gram heuristic family): deterministic
      // argmax over per-language stopword hit counts.
      val w = words(col("text"))
      def hits(ms: String*) = size(filter(w, x => x.isin(ms: _*)))
      val en = hits("the", "a", "and", "of")
      val fr = hits("le", "la", "et", "les")
      val es = hits("el", "los", "y", "que")
      val de = hits("der", "und", "die", "das")
      val pred = when(en + fr + es + de === 0, "und")
        .when(en >= fr && en >= es && en >= de, "en")
        .when(fr >= es && fr >= de, "fr")
        .when(es >= de, "es")
        .otherwise("de")
      docs(s, dir).select(col("doc_id"), pred.as("pred_lang"), col("lang"))
        .orderBy("doc_id")
    }),

    "p10_token_count" -> ((s, dir) => {
      // Whitespace tokens + a BPE-ish estimate (~4 chars/token heuristic,
      // integer arithmetic so both engines agree exactly).
      docs(s, dir).select(
        col("doc_id"),
        size(words(col("text"))).as("n_ws_tokens"),
        length(regexp_replace(col("text"), " ", "")).as("n_chars_nospace"),
        expr("(length(replace(text, ' ', '')) + 3) div 4").as("est_bpe_tokens"))
        .orderBy("doc_id")
    }),

    "p11_fingerprint" -> ((s, dir) => {
      docs(s, dir).select(col("doc_id"), fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")
    }),

    "p12_multimodal" -> ((s, dir) => {
      // Multimodal plumbing over opaque binary payloads: byte length, sha256
      // content id, and a stubbed "frame sample" count (256-byte frames) —
      // the decode itself is a deterministic stub (no media libs in the
      // container); the schema/batching is the real part (see
      // graft.functions.Multimodal).
      docs(s, dir).select(
        col("doc_id"),
        octet_length(col("text")).as("n_bytes"),
        sha2(col("text").cast("binary"), 256).as("content_sha"),
        expr("(octet_length(text) + 255) div 256").as("n_frames"))
        .orderBy("doc_id")
    }))

  private val shingleSqlCte =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (SELECT doc_id,
      |  CASE WHEN len(w) >= 3
      |    THEN list_distinct(list_transform(generate_series(1, len(w)-2),
      |         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
      |    ELSE list_distinct(w) END AS s FROM t)""".stripMargin

  /** SQL for [[TextFunctions.polyhash]] applied to expression `e`. */
  private def polyhashSql(e: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split($e, ''), c -> CAST(unicode(c) AS BIGINT))), " +
      s"(acc, c) -> (acc * 131 + c) % 1000000007)"

  /** SQL for [[TextFunctions.affine]]: (A(i)*h + B(i)) mod P with i = `i`. */
  private def affineSql(h: String, i: String): String =
    s"(((2654435761 * (($i) + 1)) % 1000000007) * ($h) + " +
      s"(2246822519 * (($i) + 1)) % 1000000007) % 1000000007"

  /** The per-table LSH bucket expression over a double-list column `v` —
    * the identical hyperplanes as [[TextFunctions.hyperplaneBuckets]],
    * inlined as exact dyadic literals (k/2^53 - 0.5 round-trips through
    * SQL text losslessly). */
  private def lshBucketSql(v: String, table: Int): String = {
    val ks = graft.functions.TextFunctions.hyperplaneKs(
      dim = 64, tables = LshTables, planes = LshPlanes)
    (0 until LshPlanes).map { p =>
      val lits = graft.functions.TextFunctions.planeKsToVec(ks(table)(p))
        .map(d => java.lang.Double.toString(d)).mkString(", ")
      s"(CASE WHEN list_dot_product($v, [$lits]) >= 0 THEN ${1 << p} ELSE 0 END)"
    }.mkString(" + ")
  }

  val oracleSql: Map[String, String] = Map(
    "p1_dedup_exact" ->
      ("SELECT min(doc_id) AS keep_id, count(*) AS n_copies FROM documents " +
        "GROUP BY text ORDER BY keep_id"),
    "p2_dedup_ngram" ->
      (shingleSqlCte + "\n" +
        "SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM sh a JOIN sh b ON a.doc_id < b.doc_id " +
        "WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(list_distinct(a.s || b.s)) >= 0.8 " +
        "ORDER BY id_a, id_b"),
    "p3_dedup_minhash" ->
      (shingleSqlCte + ",\n" +
        s"hs AS (SELECT doc_id, list_transform(s, x -> ${polyhashSql("x")}) AS h FROM sh),\n" +
        s"sig AS (SELECT doc_id, list_transform(generate_series(0, 95), " +
        s"i -> list_min(list_transform(h, x -> ${affineSql("x", "i")}))) AS sg FROM hs),\n" +
        "pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, " +
        "CAST(list_reduce(list_prepend(0, list_transform(generate_series(1, 96), " +
        "k -> CASE WHEN a.sg[k] = b.sg[k] THEN 1 ELSE 0 END)), (x, y) -> x + y) AS DOUBLE) / 96 AS est_j " +
        "FROM sig a JOIN sig b ON a.doc_id < b.doc_id) " +
        "SELECT id_a, id_b, est_j FROM pairs WHERE est_j >= 0.7 ORDER BY id_a, id_b"),
    "p4_dedup_simhash" ->
      ("WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),\n" +
        s"hs AS (SELECT doc_id, list_transform(w, x -> ${polyhashSql("x")}) AS h FROM t),\n" +
        "sh AS (SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "list_transform(generate_series(0, 63), j -> " +
        "CASE WHEN list_reduce(list_prepend(0, list_transform(h, x -> " +
        s"CASE WHEN (${affineSql("x", "j + 101")}) % 2 = 1 THEN 1 ELSE -1 END)), (p, q) -> p + q) > 0 " +
        "THEN (CASE WHEN j = 63 THEN CAST(-9223372036854775808 AS BIGINT) ELSE CAST(1 AS BIGINT) << j END) " +
        "ELSE CAST(0 AS BIGINT) END)), (a, b) -> a | b) AS s FROM hs) " +
        "SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(bit_count(xor(a.s, b.s)) AS INTEGER) AS dist " +
        "FROM sh a JOIN sh b ON a.doc_id < b.doc_id WHERE bit_count(xor(a.s, b.s)) <= 8 " +
        "ORDER BY id_a, id_b"),
    "p7_ann_lsh" ->
      ("WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),\n" +
        "b AS (SELECT vec_id, v, " +
        (0 until LshTables).map(t => s"(${lshBucketSql("v", t)}) AS b$t").mkString(", ") +
        " FROM e),\n" +
        "q AS (SELECT vec_id AS query_id, v AS qv, b0 AS qb0, b1 AS qb1, b2 AS qb2, b3 AS qb3 FROM b WHERE vec_id < 32),\n" +
        "cand AS (SELECT DISTINCT query_id, qv, b.vec_id AS neighbor_id, b.v " +
        "FROM q JOIN b ON (q.qb0 = b.b0 OR q.qb1 = b.b1 OR q.qb2 = b.b2 OR q.qb3 = b.b3) " +
        "AND query_id <> b.vec_id),\n" +
        "p AS (SELECT query_id, neighbor_id, " +
        "list_dot_product(qv, v) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))) AS c FROM cand) " +
        "SELECT query_id, neighbor_id, CAST(rn AS INTEGER) AS rank FROM (" +
        "SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rn FROM p) " +
        "WHERE rn <= 3 ORDER BY query_id, rank"),
    "p13_ann_ivf" ->
      ("WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v0 FROM embeddings),\n" +
        "n AS (SELECT vec_id, list_transform(v0, x -> x / sqrt(list_dot_product(v0, v0))) AS v FROM e),\n" +
        "c AS (SELECT vec_id AS cell, v AS cv FROM n WHERE vec_id % 31 = 5),\n" +
        "asg AS (SELECT vec_id, v, cell FROM (" +
        "SELECT n.vec_id, n.v, c.cell, row_number() OVER (PARTITION BY n.vec_id " +
        "ORDER BY list_dot_product(n.v, c.cv) DESC, c.cell) AS rn FROM n CROSS JOIN c) WHERE rn = 1),\n" +
        "probe AS (SELECT query_id, qv, cell FROM (" +
        "SELECT n.vec_id AS query_id, n.v AS qv, c.cell, row_number() OVER (PARTITION BY n.vec_id " +
        "ORDER BY list_dot_product(n.v, c.cv) DESC, c.cell) AS rn FROM n CROSS JOIN c WHERE n.vec_id < 32) WHERE rn <= 2),\n" +
        "p AS (SELECT query_id, a.vec_id AS neighbor_id, list_dot_product(qv, a.v) AS c " +
        "FROM probe JOIN asg a USING (cell) WHERE query_id <> a.vec_id) " +
        "SELECT query_id, neighbor_id, CAST(rn AS INTEGER) AS rank FROM (" +
        "SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rn FROM p) " +
        "WHERE rn <= 3 ORDER BY query_id, rank"),
    "p5_dedup_embed" ->
      ("WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings) " +
        "SELECT a.vec_id AS id_a, b.vec_id AS id_b FROM e a JOIN e b ON a.vec_id < b.vec_id " +
        "WHERE list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.45 " +
        "ORDER BY id_a, id_b"),
    "p6_ann_topk" ->
      ("WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings), " +
        "q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8), " +
        "p AS (SELECT query_id, e.vec_id AS neighbor_id, " +
        "  list_dot_product(qv, v) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))) AS c " +
        "  FROM q JOIN e ON query_id <> e.vec_id) " +
        "SELECT query_id, neighbor_id, CAST(rn AS INTEGER) AS rank FROM (" +
        "  SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rn FROM p) " +
        "WHERE rn <= 10 ORDER BY query_id, rank"),
    "p8_text_stats" ->
      ("SELECT doc_id, " +
        "CAST(len(string_split(text, ' ')) AS INTEGER) AS n_words, " +
        "CAST(length(text) AS INTEGER) AS n_chars, " +
        "CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the','a','and','of'))) AS INTEGER) AS stop_cnt, " +
        "CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the','a','and','of'))) AS DOUBLE) / len(string_split(text, ' ')) AS stop_ratio, " +
        "CAST(length(text) - length(regexp_replace(text, '[.,!?]', '', 'g')) AS INTEGER) AS punct_cnt " +
        "FROM documents ORDER BY doc_id"),
    "p9_lang_id" ->
      ("WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents), " +
        "sc AS (SELECT doc_id, lang, " +
        "len(list_filter(w, x -> x IN ('the','a','and','of'))) AS en, " +
        "len(list_filter(w, x -> x IN ('le','la','et','les'))) AS fr, " +
        "len(list_filter(w, x -> x IN ('el','los','y','que'))) AS es, " +
        "len(list_filter(w, x -> x IN ('der','und','die','das'))) AS de FROM t) " +
        "SELECT doc_id, CASE WHEN en + fr + es + de = 0 THEN 'und' " +
        "WHEN en >= fr AND en >= es AND en >= de THEN 'en' " +
        "WHEN fr >= es AND fr >= de THEN 'fr' " +
        "WHEN es >= de THEN 'es' ELSE 'de' END AS pred_lang, lang " +
        "FROM sc ORDER BY doc_id"),
    "p10_token_count" ->
      ("SELECT doc_id, CAST(len(string_split(text, ' ')) AS INTEGER) AS n_ws_tokens, " +
        "CAST(length(replace(text, ' ', '')) AS INTEGER) AS n_chars_nospace, " +
        "CAST((length(replace(text, ' ', '')) + 3) // 4 AS BIGINT) AS est_bpe_tokens " +
        "FROM documents ORDER BY doc_id"),
    "p11_fingerprint" ->
      ("WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents) " +
        "SELECT doc_id, list_reduce(" +
        "list_prepend(CAST(0 AS BIGINT), list_transform(w, x -> CAST(length(x) * 96 + ascii(substr(x, 1, 1)) AS BIGINT))), " +
        "(acc, c) -> (acc * 131 + c) % 1000000007) AS fp FROM t ORDER BY doc_id"),
    "p12_multimodal" ->
      ("SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS n_bytes, " +
        "sha256(text) AS content_sha, " +
        "CAST((octet_length(CAST(text AS BLOB)) + 255) // 256 AS BIGINT) AS n_frames " +
        "FROM documents ORDER BY doc_id"))
}
