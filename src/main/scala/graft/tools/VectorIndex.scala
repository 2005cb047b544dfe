package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.catalog.HashComponent
import graft.functions.TextFunctions.{dot, l2norm, toDouble}
import graft.table.GraftTable

/**
 * Maintained IVF vector index over an engine table — the build-once /
 * probe-many / refresh-on-mutation ANN posture a 100 TB corpus needs
 * (re-quantizing per query batch is the p13 simulation; an index that the
 * CDC surface keeps current is the production shape).
 *
 * Layout: the index is itself an engine table keyed `(cell, id)` and
 * hash-partitioned on `cell`, holding every source vector L2-normalized in
 * its IVF cell; the frozen centroids live in a sibling engine table (tiny —
 * ~min(√n, 4096) rows, broadcast to every consumer). A probe batch reads
 * the index through the engine's partition pruning: the IN-list over its
 * probed cells prunes whole hash-bucket file groups before any file opens.
 *
 * Refresh rides the engine's own CDC: `changesSince(watermark)` yields the
 * latest state + tombstones of exactly the mutated keys; re-assignment
 * touches only those vectors and commits as ONE atomic transaction
 * (upserts + moved/dead row deletes), with the new source watermark
 * recorded in the index table's properties. Centroids stay frozen between
 * rebuilds — the standard IVF contract (assignment drift is bounded by the
 * mutation rate, and a rebuild is just `build` again).
 *
 * Reference anchors: the scan layer this rides is SURVEY.md S8/P4 (PK-range
 * + hash-bucket pruning); the refresh path is S11 (diff scan) + W9
 * (multi-row transaction).
 */
object VectorIndex {

  val SrcLocKey = "graft.vindex.source"
  val IdColKey = "graft.vindex.idCol"
  val VecColKey = "graft.vindex.vecCol"
  val SrcVersionKey = "graft.vindex.sourceVersion"
  val CentsLocKey = "graft.vindex.centroids"
  val ModulusKey = "graft.vindex.modulus"

  /** (id, v): L2-normalized double vectors — the same expression shape as
    * the pipeline's normalizedVecs, so an index built from the embeddings
    * table reproduces p13's assignment bit-for-bit. Null vectors drop (a
    * vector-less row has no cell). */
  private def normalized(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = toDouble(col(vecCol))
    df.filter(col(vecCol).isNotNull)
      .select(col(idCol),
        zip_with(v, array_repeat(l2norm(v), size(v)), (x, n) => x / n).as("v"))
  }

  /** Nearest-centroid cell per vector: max dot, ties to the lowest cell —
    * a map-side-combinable max_by, never a row_number shuffle of the
    * n×cells cross product. Every assignment also carries the row's int8
    * PQ residual code against its winning centroid (65 B/vector with the
    * cell id) — the RAM-resident candidate ranking [[probePq]] reads
    * instead of raw vectors, kept current by the same refresh that moves
    * the row. */
  private def assigned(vecs: DataFrame, idCol: String, cents: DataFrame): DataFrame =
    vecs.crossJoin(broadcast(cents))
      .withColumn("d", dot(col("v"), col("cv")))
      .groupBy(col(idCol))
      .agg(max_by(struct(col("cell"), col("cv")),
          struct(col("d"), (-col("cell")).cast("double"))).as("best"),
        first(col("v")).as("v"))
      .select(col("best.cell").as("cell"), col(idCol), col("v"),
        graft.functions.TextFunctions.pqCode(col("v"), col("best.cv")).as("code"))

  /**
   * Build the index beside `source` (any engine table with an integral id
   * column and an array vector column). Deterministic medoid centroids with
   * the modulus derived from n — M = max(⌈√n⌉, ⌈n/4096⌉) keeps the cell
   * count (≈ n/M) sublinear and the centroid broadcast bounded at any
   * scale. Two engine tables are created: `location` (the index) and
   * `location + "_cents"` (the frozen centroids).
   */
  def build(spark: SparkSession, source: GraftTable, idCol: String,
      vecCol: String, location: String, buckets: Int = 16): GraftTable = {
    // back-pointer first (a marker file, no commit): from this moment the
    // source's history GC floors its expiry at this index's watermark —
    // see DerivedTables.register
    DerivedTables.register(source, location)
    val m = source.meta
    require(m.column(idCol).dataType == LongType,
      s"vector index id column must be LONG, got ${m.column(idCol).dataType}")
    val srcVersion = m.version
    // pinned to the watermark version: an unpinned scan could read a later
    // commit than the recorded watermark (see SecondaryIndex.build)
    val vecs0 = normalized(source.scan(Some(srcVersion)), idCol, vecCol)
    val n = vecs0.count()
    require(n > 0, s"${m.name} has no vectors in $vecCol")
    // The assignment below is the build's dominant term (~n·√n pair dots)
    // and is CPU-bound, so its parallelism must come from the ROW COUNT,
    // not from however many files the source happens to occupy — a small
    // table written as one PK-sorted file would otherwise assign on one
    // core. ~4096 vectors per task, capped at the session width.
    val spreadParts = math.max(1L, math.min(
      spark.conf.get("spark.sql.shuffle.partitions").toInt.toLong,
      math.ceil(n / 4096.0).toLong)).toInt
    val vecs = vecs0.repartition(spreadParts)
    val mMod = math.max(1L, math.max(
      math.ceil(math.sqrt(n.toDouble)).toLong,
      math.ceil(n / 4096.0).toLong))
    val cents = vecs0.filter(col(idCol) % mMod === lit(5L % mMod))
      .select(col(idCol).as("cell"), col("v").as("cv"))
    val centsLoc = location + "_cents"
    GraftTable.create(spark, centsLoc, s"${m.name}_${vecCol}_cents",
      StructType(Seq(
        StructField("cell", LongType, nullable = false),
        StructField("cv", ArrayType(DoubleType), nullable = true))),
      Seq("cell"), data = Some(cents))
    val idx =
      try GraftTable.create(spark, location, s"${m.name}_${vecCol}_idx",
        StructType(Seq(
          StructField("cell", LongType, nullable = false),
          StructField(idCol, LongType, nullable = false),
          StructField("v", ArrayType(DoubleType), nullable = true),
          StructField("code", BinaryType, nullable = true))),
        Seq("cell", idCol),
        hash = Seq(HashComponent(Seq("cell"), buckets)),
        data = Some(assigned(vecs, idCol, cents)))
      catch {
        case e: Throwable =>
          // don't strand a half-built index: the cents table is useless
          // without its index
          try GraftTable.drop(centsLoc) catch { case _: Throwable => () }
          throw e
      }
    idx.setProperties(Map(
      SrcLocKey -> Some(m.location),
      IdColKey -> Some(idCol),
      VecColKey -> Some(vecCol),
      SrcVersionKey -> Some(srcVersion.toString),
      CentsLocKey -> Some(centsLoc),
      ModulusKey -> Some(mMod.toString)))
    // marker re-write after the watermark commit — heals a marker an
    // expiry tick deregistered mid-build (see SecondaryIndex.build)
    DerivedTables.register(source, location)
    idx
  }

  /** The index's frozen centroid frame (cell, cv). */
  def centroids(spark: SparkSession, index: GraftTable): DataFrame =
    GraftTable.load(spark, index.properties(CentsLocKey)).scan()

  /**
   * ANN probe: `queries` is (query_id LONG, qv ARRAY<DOUBLE> normalized);
   * each query ranks the exact dot top-k within its `nProbe` nearest cells.
   * The index scan carries an IN-list over the batch's probed cells, so
   * whole hash buckets prune before any file opens; `assertPrune` turns
   * that into a hard in-query gate (≤ half the index files may open).
   */
  def probe(spark: SparkSession, index: GraftTable, queries: DataFrame,
      nProbe: Int = 2, k: Int = 3, assertPrune: Boolean = false): DataFrame = {
    val idCol = index.properties(IdColKey)
    val cents = centroids(spark, index)
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("d").desc, col("cell"))
    val probeCells = queries.crossJoin(broadcast(cents))
      .withColumn("d", dot(col("qv"), col("cv")))
      .withColumn("r", row_number().over(wProbe)).filter(col("r") <= nProbe)
      .select(col("query_id"), col("qv"), col("cell"))
    // the probe set is per-query-batch small by construction (queries ×
    // nProbe cells) — the one driver-side collect an index lookup needs
    val cells = probeCells.select("cell").distinct()
      .collect().map(_.getLong(0)).sorted
    val filters: Seq[org.apache.spark.sql.sources.Filter] =
      Seq(org.apache.spark.sql.sources.In("cell", cells.map(c => c: Any)))
    if (assertPrune) {
      val kept = graft.sources.PartitionPruner.pruneFiles(
        index.meta, index.meta.baseFiles, filters)
      val total = index.meta.baseFiles.length
      if (kept.length * 2 > total)
        throw new IllegalStateException(
          s"index probe must prune hash buckets: kept ${kept.length} of " +
            s"$total files for ${cells.length} probed cells")
    }
    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("c").desc, col("neighbor_id"))
    index.scanPruned(filters)
      .join(broadcast(probeCells), "cell")
      .filter(col("query_id") =!= col(idCol))
      .withColumn("c", dot(col("qv"), col("v")))
      .select(col("query_id"), col(idCol).as("neighbor_id"), col("c"))
      .withColumn("rank", row_number().over(wRank)).filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  /**
   * ADC probe over the stored PQ codes — the RAM-resident path for a
   * 100 TB embedding corpus: the candidate stage reads (cell, id, code)
   * ONLY — 65 B/vector instead of the 512 B raw vector, an 8× I/O and
   * memory cut Spark's column pruning enforces at the parquet scan — and
   * ranks by the integer-exact quantized score `qz·cz + (qz·code)·2^14`
   * (p15's contract: all int64, no float-summation knife edge). The top
   * `k·rerank` survivors per query then load their RAW vectors through a
   * second (cell,id)-semi-joined pruned read and re-rank by exact dot, so
   * the returned top-k differs from [[probe]] only when a true neighbor's
   * quantized score falls outside the survivor set — recall is gated in
   * VectorIndexSpec. Same cell pruning as [[probe]]: the IN-list over the
   * batch's probed cells drops whole hash-bucket file groups; cell choice
   * uses the integer dots too.
   */
  def probePq(spark: SparkSession, index: GraftTable, queries: DataFrame,
      nProbe: Int = 2, k: Int = 3, rerank: Int = 4,
      assertPrune: Boolean = false): DataFrame = {
    val idCol = index.properties(IdColKey)
    val quant = (c: Column) =>
      transform(c, x => floor(x * graft.functions.TextFunctions.QuantScale).cast("long"))
    val idot = (a: Column, b: Column) =>
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)
    val cents = centroids(spark, index).withColumn("cz", quant(col("cv")))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("d").desc, col("cell"))
    // per-(query, cell) quantized frame is tiny (queries × nProbe): the
    // query-centroid dot computes ONCE here and rides the broadcast — the
    // per-candidate hot loop below is only the codegen'd ADC byte dot
    val probeCells = queries.withColumn("qz", quant(col("qv")))
      .crossJoin(broadcast(cents))
      .withColumn("d", idot(col("qz"), col("cz")))
      .withColumn("r", row_number().over(wProbe)).filter(col("r") <= nProbe)
      .select(col("query_id"), col("qv"), col("qz"), col("cell"),
        col("d").as("qc"))
    val cells = probeCells.select("cell").distinct()
      .collect().map(_.getLong(0)).sorted
    val filters: Seq[org.apache.spark.sql.sources.Filter] =
      Seq(org.apache.spark.sql.sources.In("cell", cells.map(c => c: Any)))
    if (assertPrune) {
      val kept = graft.sources.PartitionPruner.pruneFiles(
        index.meta, index.meta.baseFiles, filters)
      val total = index.meta.baseFiles.length
      if (kept.length * 2 > total)
        throw new IllegalStateException(
          s"index probe must prune hash buckets: kept ${kept.length} of " +
            s"$total files for ${cells.length} probed cells")
    }
    val topR = math.max(k, k * rerank)
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    // candidate stage: codes only — `v` must NOT appear here, so column
    // pruning keeps raw vectors out of the scan (spec-asserted)
    val cand = index.scanPruned(filters)
      .select(col("cell"), col(idCol), col("code"))
      .join(broadcast(probeCells.select("query_id", "qz", "cell", "qc")), "cell")
      .filter(col("query_id") =!= col(idCol))
      .withColumn("score", col("qc") +
        graft.functions.TextFunctions.adcDot(col("qz"), col("code")) * lit(16384L))
      .select(col("query_id"), col(idCol).as("neighbor_id"), col("cell"),
        col("score"))
      .withColumn("r", row_number().over(wAdc)).filter(col("r") <= topR)
      .select("query_id", "neighbor_id", "cell")
    if (assertPrune) {
      // the candidate stage's contract: its scan reads the 65 B/vector
      // codes WITHOUT the raw vectors (column pruning reaches the parquet
      // scan). The stage executes eagerly below, so the check lives here
      // where its plan is still visible.
      val schemas = cand.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        .linesIterator.filter(_.contains("ReadSchema")).toSeq
      if (!schemas.exists(l => l.contains("code:") && !l.contains("v:array")))
        throw new IllegalStateException(
          s"candidate stage must scan codes without raw vectors:\n" +
            schemas.mkString("\n"))
    }
    // the survivor set is plan-time-sized by construction (≤ queries ×
    // k·rerank rows) — collect it so the re-rank scan below pushes an id
    // IN-list, reading only the survivors' raw vectors (row-group pruning
    // within the probed cells) instead of every raw vector in every probed
    // cell; the collected frame also stops the whole ADC candidate subplan
    // from re-executing inside the re-rank job
    val candRows = cand.collect()
    val candDf = broadcast(spark.createDataFrame(
      spark.sparkContext.parallelize(candRows.toSeq, 1),
      org.apache.spark.sql.types.StructType(
        cand.schema.fields.map(_.copy(nullable = true)))))
    val survivorIds = candRows.map(_.get(1)).distinct
    val rerankFilters = filters :+ (org.apache.spark.sql.sources.In(idCol,
      survivorIds) : org.apache.spark.sql.sources.Filter)
    // survivors' raw vectors load through a second pruned read (exact
    // key join on the broadcast survivor set) and re-rank by exact dot.
    // The id IN-list rides twice: as a source filter (manifest/zone file
    // pruning inside the probed cells) and as a Catalyst predicate (parquet
    // row-group pruning inside surviving files) — both bounded by the
    // plan-time survivor count.
    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("c").desc, col("neighbor_id"))
    index.scanPruned(rerankFilters)
      .filter(col(idCol).isin(survivorIds.toSeq: _*))
      .select(col("cell"), col(idCol).as("neighbor_id"), col("v"))
      .join(candDf, Seq("cell", "neighbor_id"))
      .join(broadcast(queries.select(col("query_id"), col("qv"))),
        "query_id")
      .withColumn("c", dot(col("qv"), col("v")))
      .select(col("query_id"), col("neighbor_id"), col("c"))
      .withColumn("rank", row_number().over(wRank)).filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  /**
   * Incremental refresh from the source's change stream: reads ONLY the
   * keys mutated since the recorded watermark (`changesSince` — the S11
   * fast path when no compaction intervened), re-assigns their vectors
   * against the frozen centroids, and commits upserts + moved/dead-row
   * tombstones as ONE atomic transaction. O(changed × cells), never
   * O(index) — FOR REAL: the stale rows are the BEFORE-IMAGE cells of the
   * mutated ids, and the index (hash-partitioned on `cell`) cannot be
   * probed by id, so they derive from the SOURCE's watermark snapshot
   * instead. By the maintenance invariant the index at watermark v0 is
   * exactly the deterministic assignment of `source@v0` against the
   * frozen centroids, so re-assigning the changed ids' v0 vectors
   * reproduces their current index rows bit-for-bit (same expressions,
   * same tie-break). When the changed-id set fits `maxPruneKeys` it
   * collects and pushes an IN-list over the id column into the v0 scan —
   * a source keyed/partitioned on the id prunes untouched tablets at the
   * manifest level (S8/P4); larger backfill-sized sets fall back to a
   * distributed semi-join over the v0 snapshot (O(source), never
   * O(index), no driver risk). Returns false when the index is already
   * current.
   *
   * If the source's history GC expired the watermark version, the change
   * read errors cleanly ("expired") — rebuild with [[build]] (an index
   * left unrefreshed past the retention window has no cheaper path).
   */
  def refresh(spark: SparkSession, index: GraftTable,
      maxPruneKeys: Int = 4096, assertPrune: Boolean = false): Boolean =
      DerivedTables.lockFor(index.location).synchronized {
    val p = index.properties
    val src = GraftTable.load(spark, p(SrcLocKey))
    val v0 = p(SrcVersionKey).toLong
    val v1 = src.meta.version
    if (v1 == v0) return false
    // tiny CDC window → one static plan per action (see
    // SecondaryIndex.refresh: same explicit-exchange posture)
    val winBytes = src.cdcWindowBytes(v0, v1)
    GraftTable.withStaticPlan(spark,
      winBytes.exists(_ <= GraftTable.staticPlanMaxBytes)) {
      refreshImpl(spark, index, src, v0, v1, maxPruneKeys, assertPrune,
        winBytes)
    }
  }

  private def refreshImpl(spark: SparkSession, index: GraftTable,
      src: GraftTable, v0: Long, v1: Long,
      maxPruneKeys: Int, assertPrune: Boolean,
      winBytes: Option[Long]): Boolean = {
    val p = index.properties
    val idCol = p(IdColKey)
    val vecCol = p(VecColKey)
    val cents = centroids(spark, index)
    val changed0 = src.changesSince(v0, v1)
      .select(col(idCol), col(vecCol), col(GraftTable.DeletedCol))
    // ONE bounded probe collects the changed rows (latest-per-key, so row
    // count == id count); the common small window then derives ids and the
    // fresh assignment from a LOCAL relation — no persist, no distributed
    // distinct, no second CDC pass (see SecondaryIndex.refresh). Over-bound
    // windows keep the distributed derivation.
    // manifest-big (or unknown-size) window → persist BEFORE the bounded
    // probe so the over-bound fallback reuses the materialized CDC
    // partitions (see SecondaryIndex.refresh)
    val winBig = winBytes.forall(_ > GraftTable.staticPlanMaxBytes)
    val probed =
      if (winBig) changed0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else changed0
    val changedRows = probed.limit(maxPruneKeys + 1).collect()
    val small = changedRows.length <= maxPruneKeys
    if (small && winBig) probed.unpersist(blocking = false)
    val changed =
      // LocalRelation, not an RDD-backed frame — exact tiny stats keep
      // the downstream joins broadcast under a static plan (see
      // SecondaryIndex.refresh)
      if (small) {
        import scala.jdk.CollectionConverters._
        spark.createDataFrame(changedRows.toSeq.asJava,
          StructType(changed0.schema.fields.map(_.copy(nullable = true))))
      } else if (winBig) probed
      else changed0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val ids = changed.select(col(idCol)).distinct()
      val rows =
        if (small) {
          val i = changed0.schema.fieldIndex(idCol)
          changedRows.map(r => org.apache.spark.sql.Row(r.get(i))).distinct
        } else ids.limit(maxPruneKeys + 1).collect()
      if (rows.isEmpty) {
        // version moved with no logical row change (e.g. a compaction):
        // just advance the watermark
        index.setProperties(Map(SrcVersionKey -> Some(v1.toString)))
        return true
      }
      // latest state of surviving mutated vectors → their (possibly moved)
      // cells; a NULLed-out vector counts as removal
      val fresh = assigned(
        normalized(changed.filter(!col(GraftTable.DeletedCol)), idCol, vecCol),
        idCol, cents)
      val oldSrc =
        if (rows.length <= maxPruneKeys) {
          val filters: Seq[org.apache.spark.sql.sources.Filter] =
            Seq(org.apache.spark.sql.sources.In(idCol,
              rows.map(_.get(0)).distinct.toArray))
          if (assertPrune) {
            val m0 = src.metaAt(v0)
            val kept = graft.sources.PartitionPruner.pruneFiles(
              m0, m0.baseFiles, filters)
            if (kept.length * 2 > m0.baseFiles.length)
              throw new IllegalStateException(
                s"vector-index refresh must prune the v0 source scan: " +
                  s"kept ${kept.length} of ${m0.baseFiles.length} files " +
                  s"for ${rows.length} changed ids")
          }
          val idDf = broadcast(spark.createDataFrame(
            spark.sparkContext.parallelize(rows.toSeq, 1),
            StructType(ids.schema.fields.map(_.copy(nullable = true)))))
          src.scanPruned(filters, Some(v0)).join(idDf, Seq(idCol), "left_semi")
        } else {
          if (assertPrune) throw new IllegalStateException(
            s"vector-index refresh fell back to the semi-join path " +
              s"(> $maxPruneKeys changed ids)")
          src.scan(Some(v0)).join(ids, Seq(idCol), "left_semi")
        }
      // before-image (cell, id) rows the fresh assignment does not
      // re-assert are stale (moved cell, deleted id); the txn allows one
      // op per key, and upsert already covers re-asserted rows
      // small path: fresh is window-bounded but its estimate flows through
      // a crossJoin + window — broadcast explicitly so a static plan never
      // picks a session-width sort-merge join; over-bound keeps AQE's call
      val freshKeys = fresh.select(col("cell"), col(idCol))
      val stale = assigned(normalized(oldSrc, idCol, vecCol), idCol, cents)
        .select(col("cell"), col(idCol))
        .join(if (small) broadcast(freshKeys) else freshKeys,
          Seq("cell", idCol), "left_anti")
      // watermark rides the SAME atomic commit as the rows (see
      // SecondaryIndex.refresh — the before-image derivation requires
      // index state and watermark to move together)
      RefreshCommit(index, fresh, stale,
        watermark = Map(SrcVersionKey -> Some(v1.toString)),
        // ~2x the window per changed id (fresh + stale) — manifest-derived
        // size for the commit's guard-window exchange
        sizeHintBytes = winBytes.map(b => b * 2 + 1024))
      true
    } finally if (!small) changed.unpersist(blocking = false)
  }
}
