package graft.sources.v2

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.types._

/**
 * Merge-on-read overlay for the DSv2 batch scan: the per-partition analog
 * of the DSv1 path's "base ANTI-JOIN delta-keys ∪ latest-delta-rows"
 * (reference: DeltaApplier, tablet/delta_applier.h:52 — deltas applied over
 * each rowset at read). The latest delta state is broadcast (the delta
 * fileset is bounded by broadcastDeltaBytes before this path is taken);
 * each bucket's reader suppresses base rows whose key carries a delta and
 * appends the bucket's own upsert rows — routed by the SAME murmur3-pmod
 * arithmetic the writer bucketed with, so the reported key grouping (and
 * any storage-partitioned join built on it) stays exact.
 *
 * @param types    column types of the INTERNAL read schema (the required
 *                 columns plus any key columns pruned out of the projection)
 * @param keyIdx   positions of the key columns in the internal schema
 * @param outIdx   positions of the caller's required columns in the internal
 *                 schema (identity when no key column had to be re-added)
 * @param dead     keys carrying any delta (upsert or tombstone) — base rows
 *                 with these keys are superseded
 * @param upserts  latest non-delete delta rows (internal-schema order),
 *                 grouped by partition route (composite hash bucket as a
 *                 string, or "rangeKey#bucket" under per-range overrides)
 */
case class MorOverlayInfo(
    types: Array[DataType],
    keyIdx: Array[Int],
    outIdx: Array[Int],
    identity: Boolean,
    dead: java.util.HashSet[Seq[Any]],
    upserts: Map[String, Array[Array[Any]]])

/** Columnar capability for the broadcast overlay (S13 under mutation — the
  * reference's scans stay columnar through delta application,
  * tablet/delta_applier.h): `bare` reads the CALLER's schema directly for
  * clean routes, `clean` names the routes provably untouched by any delta
  * row (computable only when the route is a pure function of the key
  * columns — then a dead key's base row can only sit in the dead key's own
  * route). Spark forbids mixing row and columnar partitions in one scan,
  * so dirty routes serve batches too, via [[MorColumnarReader]]. */
case class ColumnarMorSupport(
    bare: PartitionReaderFactory,
    clean: Set[String])

class MorOverlayReaderFactory(
    inner: PartitionReaderFactory,
    info: Broadcast[MorOverlayInfo],
    val columnar: Option[ColumnarMorSupport] = None) extends PartitionReaderFactory {

  private def routeOf(p: InputPartition): String = p match {
    // the COMPOSITE id (upserts are routed by the full bucketExpr fold);
    // partitionKey() carries the decoded per-component ids for SPJ
    case k: org.apache.spark.sql.GraftKeyedFilePartition => k.compositeBucket.toString
    // unreported-grouping layouts: the planner stamped the owned route
    case r: org.apache.spark.sql.GraftRoutedFilePartition => r.route
    case _ => null // coordinate-less single partition: owns every upsert
  }
  private def ownsOf(p: InputPartition): Boolean = p match {
    case r: org.apache.spark.sql.GraftRoutedFilePartition => r.ownsDeltas
    case _ => true
  }

  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new MorOverlayReader(inner.createReader(p), info.value, routeOf(p), ownsOf(p))

  // Uniform across partitions (both delegates answer from schema + conf
  // alone) — Spark's scan exec requires all-or-nothing columnar.
  override def supportColumnarReads(p: InputPartition): Boolean =
    columnar.exists(c =>
      c.bare.supportColumnarReads(p) && inner.supportColumnarReads(p))

  override def createColumnarReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    val c = columnar.get
    val route = routeOf(p)
    if (route != null && c.clean.contains(route))
      c.bare.createColumnarReader(p) // pass-through: no probe, no key re-add
    else
      new MorColumnarReader(inner.createColumnarReader(p), info.value,
        route, ownsOf(p))
  }
}

/**
 * Shuffle-spill variant of the overlay, for delta sets past the broadcast
 * bound: the planner shuffled the latest delta state into one parquet spill
 * per route (GraftV2Scan.createReaderFactory), and each split's reader
 * drains ONLY its own route's spill into a local dead-set + upsert list
 * before serving base rows — per-tablet delta memory, never whole-table
 * (the reference's DeltaApplier posture, tablet/delta_applier.h:52).
 * Correctness rests on the planner's spillRoutable guard: every base file
 * carries the coordinate its route derives from, so a key's base rows and
 * its delta slice always meet in the same split.
 *
 * @param opIdx  position of the op column in the spill schema (= number of
 *               internal data columns)
 */
class SpillMorOverlayReaderFactory(
    inner: PartitionReaderFactory,
    deltaFactory: PartitionReaderFactory,
    types: Array[DataType],
    keyIdx: Array[Int],
    outIdx: Array[Int],
    identity: Boolean,
    opIdx: Int,
    // route -> its spill slice's parquet paths (a split rebuilds its own
    // file partition executor-side, so the paths can first be redirected
    // through the executor-local slice cache)
    routeParts: Map[String, Seq[String]],
    // Set when the planner served a key-grouped layout with coordinate-less
    // files as ONE unkeyed split: that split reads this (single) route's
    // slice, which carries every delta row.
    defaultRoute: Option[String] = None,
    // bare requiredSchema reader — splits whose route has NO spill slice
    // pass through it columnar (sound for every spill route kind: interval
    // routing duplicates a delta into each candidate file's slice, so an
    // empty slice proves no delta can touch this split's rows)
    bare: Option[PartitionReaderFactory] = None,
    // serve slice reads through SpillLocalCache (cfile/block_cache.h
    // analog): repeat reads of a hot tablet hit executor-local disk
    // instead of re-fetching the shared-FS spill. Captured at planning
    // from `graft.mor.spillCache` (default true).
    localCache: Boolean = true) extends PartitionReaderFactory {

  private def routeOf(p: InputPartition): String = p match {
    case k: org.apache.spark.sql.GraftKeyedFilePartition => k.compositeBucket.toString
    case r: org.apache.spark.sql.GraftRoutedFilePartition => r.route
    case _ => defaultRoute.getOrElse(throw new IllegalStateException(
      "spill overlay requires route-carrying splits (spillRoutable guard)"))
  }
  private def ownsOf(p: InputPartition): Boolean = p match {
    case r: org.apache.spark.sql.GraftRoutedFilePartition => r.ownsDeltas
    case _ => true
  }

  /** Drain this route's spill slice into an overlay state (executor-side,
    * per split — the per-tablet memory posture). */
  private def infoFor(route: String, owns: Boolean): MorOverlayInfo = {
    val dead = new java.util.HashSet[Seq[Any]]()
    val ups = scala.collection.mutable.ArrayBuffer[Array[Any]]()
    routeParts.get(route).foreach { paths0 =>
      val paths = if (localCache) paths0.map(SpillLocalCache.localize) else paths0
      val dp: InputPartition =
        org.apache.spark.sql.GraftSqlBridge.filePartition(0, paths, None)
      val dr = deltaFactory.createReader(dp)
      try {
        while (dr.next()) {
          val r = dr.get().copy() // reader reuses its row buffer
          dead.add(MorOverlay.keyOf(r, keyIdx, types))
          if (owns && r.getUTF8String(opIdx).toString != graft.table.GraftTable.OpDelete)
            ups += Array.tabulate(types.length)(i => r.get(i, types(i)))
        }
      } finally dr.close()
    }
    MorOverlayInfo(types, keyIdx, outIdx, identity, dead,
      if (ups.isEmpty) Map.empty else Map(route -> ups.toArray))
  }

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val route = routeOf(p)
    val owns = ownsOf(p)
    new MorOverlayReader(inner.createReader(p), infoFor(route, owns), route, owns)
  }

  override def supportColumnarReads(p: InputPartition): Boolean =
    bare.exists(b =>
      b.supportColumnarReads(p) && inner.supportColumnarReads(p))

  override def createColumnarReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    val route = routeOf(p)
    if (!routeParts.contains(route))
      bare.get.createColumnarReader(p) // empty slice: clean pass-through
    else {
      val owns = ownsOf(p)
      new MorColumnarReader(inner.createColumnarReader(p),
        infoFor(route, owns), route, owns)
    }
  }
}

/**
 * Routed-attachment variant of the overlay: the table's flushed delta
 * files carry tablet coordinates (compactDeltas on a partitioned table —
 * the reference's DMS flush into per-rowset delta stores,
 * tablet/deltafile.h), so each split folds ITS OWN tablet's flushed
 * deltas straight from disk — no broadcast, no shuffle, at any flushed
 * size — and overlays the (small, broadcast) unrouted tail on top. Tail
 * entries always win per key: the flush folded seqs ≤ its manifest seq,
 * and every tail commit is newer.
 *
 * @param opIdx   position of the op column in the slice schema
 * @param seqIdx  position of the seq column in the slice schema
 * @param tail    broadcast overlay of the unrouted tail (its `dead` covers
 *                every tail key, so routed upserts it supersedes are
 *                suppressed; its per-route `upserts` emit as usual)
 */
class RoutedMorReaderFactory(
    inner: PartitionReaderFactory,
    deltaFactory: PartitionReaderFactory,
    types: Array[DataType],
    keyIdx: Array[Int],
    outIdx: Array[Int],
    identity: Boolean,
    opIdx: Int,
    seqIdx: Int,
    // route -> its flushed slice's parquet paths; the split rebuilds its
    // file partition executor-side so reads can redirect through the
    // executor-local slice cache (flushed files are immutable — commits
    // only add new paths — so a local copy never staleness-races)
    routeParts: Map[String, Seq[String]],
    tail: Broadcast[MorOverlayInfo],
    defaultRoute: Option[String] = None,
    // Columnar capability: `clean` = routes the TAIL provably never
    // touches (planner-computed, key-derivable layouts only); a split is
    // fully clean when additionally no flushed slice attaches to it.
    columnar: Option[ColumnarMorSupport] = None,
    localCache: Boolean = true) extends PartitionReaderFactory {

  private def routeOf(p: InputPartition): String = p match {
    case k: org.apache.spark.sql.GraftKeyedFilePartition => k.compositeBucket.toString
    case r: org.apache.spark.sql.GraftRoutedFilePartition => r.route
    case _ => defaultRoute.getOrElse(throw new IllegalStateException(
      "routed delta attachment requires route-carrying splits"))
  }
  private def ownsOf(p: InputPartition): Boolean = p match {
    case r: org.apache.spark.sql.GraftRoutedFilePartition => r.ownsDeltas
    case _ => true
  }

  override def supportColumnarReads(p: InputPartition): Boolean =
    columnar.exists(c =>
      c.bare.supportColumnarReads(p) && inner.supportColumnarReads(p))

  override def createColumnarReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    val c = columnar.get
    val route = routeOf(p)
    if (!routeParts.contains(route) && c.clean.contains(route))
      c.bare.createColumnarReader(p) // no flushed slice, tail-clean route
    else {
      val owns = ownsOf(p)
      new MorColumnarReader(inner.createColumnarReader(p),
        infoFor(route, owns), route, owns)
    }
  }

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val route = routeOf(p)
    val owns = ownsOf(p)
    new MorOverlayReader(inner.createReader(p), infoFor(route, owns), route, owns)
  }

  /** Fold this split's flushed slice to latest-per-key and merge the
    * broadcast tail on top (tail always wins per key). */
  private def infoFor(route: String, owns: Boolean): MorOverlayInfo = {
    val t = tail.value
    val opDelete = graft.table.GraftTable.OpDelete
    // fold the split's flushed slice to latest-per-key — same (seq desc,
    // op desc) tie-break as latestDeltas ("U" > "D": the upsert wins)
    val best = new java.util.HashMap[Seq[Any], (Long, String, Array[Any])]()
    routeParts.get(route).foreach { paths0 =>
      val paths = if (localCache) paths0.map(SpillLocalCache.localize) else paths0
      val dp: InputPartition =
        org.apache.spark.sql.GraftSqlBridge.filePartition(0, paths, None)
      val dr = deltaFactory.createReader(dp)
      try {
        while (dr.next()) {
          val r = dr.get().copy() // reader reuses its row buffer
          val key = MorOverlay.keyOf(r, keyIdx, types)
          val seq = r.getLong(seqIdx)
          val op = r.getUTF8String(opIdx).toString
          val cur = best.get(key)
          if (cur == null || seq > cur._1 || (seq == cur._1 && op > cur._2)) {
            val row =
              if (op == opDelete) null
              else Array.tabulate(types.length)(i => r.get(i, types(i)))
            best.put(key, (seq, op, row))
          }
        }
      } finally dr.close()
    }
    val dead = new java.util.HashSet[Seq[Any]](t.dead)
    val ups = scala.collection.mutable.ArrayBuffer[Array[Any]]()
    best.forEach { (k, v) =>
      dead.add(k)
      // a tail entry (upsert OR tombstone) for this key is newer than the
      // flushed winner — the flushed upsert must not emit
      if (owns && v._2 != opDelete && !t.dead.contains(k)) ups += v._3
    }
    t.upserts.get(route).foreach(a => ups ++= a)
    MorOverlayInfo(types, keyIdx, outIdx, identity, dead,
      if (ups.isEmpty) Map.empty else Map(route -> ups.toArray))
  }
}

object MorOverlay {
  /** Key tuple with VALUE semantics: binary key columns come out of
    * InternalRow as Array[Byte], whose equals/hashCode are by reference —
    * wrap them so the dead-set probe compares contents. Used by both the
    * driver-side set construction and the per-row reader probe. */
  def keyOf(row: InternalRow, idx: Array[Int],
      types: Array[DataType]): Seq[Any] = {
    val a = new Array[Any](idx.length)
    var i = 0
    while (i < idx.length) {
      // types is indexed by ROW position (idx(i)), not by key ordinal
      a(i) = row.get(idx(i), types(idx(i))) match {
        case b: Array[Byte] => b.toSeq
        case v => v
      }
      i += 1
    }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(a)
  }
}

object MorColumnarReader {
  /** Types [[MorColumnarReader]] can WRITE back into an OnHeapColumnVector
    * (`set` below). Narrower than what the stock parquet factory can read
    * vectorized — ANSI interval columns, e.g., decode columnar since Spark
    * 3.3 but have no case in `set` — so the planner must gate columnar MOR
    * on THIS set, not just on the parquet factory's answer, or a
    * delta-carrying table with such a column would fail mid-scan on its
    * first dirty route instead of falling back to the row overlay. */
  def supportsType(dt: DataType): Boolean = dt match {
    case BooleanType | ByteType | ShortType | IntegerType | DateType |
         LongType | TimestampType | TimestampNTZType | FloatType |
         DoubleType | BinaryType => true
    case _: org.apache.spark.sql.types.DecimalType => true
    case _: org.apache.spark.sql.types.StringType => true
    case _ => false
  }
  def supportsAll(schema: org.apache.spark.sql.types.StructType): Boolean =
    schema.fields.forall(f => supportsType(f.dataType))
}

/**
 * Columnar merge-on-read: serves ColumnarBatches over a delta-carrying
 * split (the reference applies deltas without leaving its columnar
 * RowBlocks — tablet/delta_applier.h). Per inner batch: probe each row's
 * key against the broadcast dead set; a batch with no superseded rows
 * passes through untouched (the overwhelming case — deltas touch few
 * row groups of a 100 TB table), a batch with hits copies the survivors
 * into fresh vectors; the split's upserts emit as one final batch. The
 * parquet decode underneath stays vectorized either way.
 */
class MorColumnarReader(
    inner: PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch],
    info: MorOverlayInfo,
    route: String,
    emitUpserts: Boolean) extends PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
  import org.apache.spark.sql.vectorized.{ColumnarBatch, ColumnVector}
  import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector

  private var current: ColumnarBatch = _
  private var upsDone = false
  private val noDead = info.dead.isEmpty
  private val outTypes: Array[DataType] = info.outIdx.map(info.types)
  private val ups: Array[Array[Any]] =
    if (!emitUpserts) Array.empty
    else if (route != null) info.upserts.getOrElse(route, Array.empty[Array[Any]])
    else info.upserts.valuesIterator.flatten.toArray

  /** Write one internal-format value into a writable vector. Only atomic
    * types can arrive here: the factory offers columnar reads only when
    * the stock parquet factory does, which requires an all-atomic schema. */
  private def set(v: OnHeapColumnVector, i: Int, dt: DataType, value: Any): Unit =
    if (value == null) v.putNull(i) else dt match {
      case BooleanType => v.putBoolean(i, value.asInstanceOf[Boolean])
      case ByteType => v.putByte(i, value.asInstanceOf[Byte])
      case ShortType => v.putShort(i, value.asInstanceOf[Short])
      case IntegerType | DateType => v.putInt(i, value.asInstanceOf[Int])
      case LongType | TimestampType | TimestampNTZType =>
        v.putLong(i, value.asInstanceOf[Long])
      case FloatType => v.putFloat(i, value.asInstanceOf[Float])
      case DoubleType => v.putDouble(i, value.asInstanceOf[Double])
      case d: org.apache.spark.sql.types.DecimalType =>
        v.putDecimal(i, value.asInstanceOf[org.apache.spark.sql.types.Decimal],
          d.precision)
      case _: org.apache.spark.sql.types.StringType =>
        val b = value.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
        v.putByteArray(i, b, 0, b.length)
      case BinaryType =>
        val b = value.asInstanceOf[Array[Byte]]
        v.putByteArray(i, b, 0, b.length)
      case other => throw new UnsupportedOperationException(
        s"columnar merge-on-read over $other")
    }

  private def batchOf(rows: Iterator[Int => Any], n: Int): ColumnarBatch = {
    val vs = outTypes.map(t => new OnHeapColumnVector(n, t))
    var j = 0
    rows.foreach { row =>
      var c = 0
      while (c < outTypes.length) { set(vs(c), j, outTypes(c), row(c)); c += 1 }
      j += 1
    }
    new ColumnarBatch(vs.map(v => v: ColumnVector), n)
  }

  override def next(): Boolean = {
    while (inner.next()) {
      val batch = inner.get()
      val n = batch.numRows()
      // probe pass: indices of rows NOT superseded by a delta
      val keep: Array[Int] = if (noDead) null else {
        val buf = new Array[Int](n)
        var k = 0; var i = 0
        while (i < n) {
          val row = batch.getRow(i)
          if (!info.dead.contains(MorOverlay.keyOf(row, info.keyIdx, info.types))) {
            buf(k) = i; k += 1
          }
          i += 1
        }
        if (k == n) null else java.util.Arrays.copyOf(buf, k)
      }
      if (keep == null) {
        // untouched batch: re-expose the caller's columns without copying
        current =
          if (info.identity) batch
          else new ColumnarBatch(
            info.outIdx.map(batch.column(_): ColumnVector), n)
        return true
      } else if (keep.length > 0) {
        current = batchOf(keep.iterator.map { i =>
          val row = batch.getRow(i)
          c => row.get(info.outIdx(c), outTypes(c))
        }, keep.length)
        return true
      }
      // every row of this batch superseded: read on
    }
    if (!upsDone) {
      upsDone = true
      if (ups.nonEmpty) {
        current = batchOf(ups.iterator.map(a => c => a(info.outIdx(c))), ups.length)
        return true
      }
    }
    false
  }

  override def get(): ColumnarBatch = current
  override def close(): Unit = inner.close()
}

class MorOverlayReader(
    inner: PartitionReader[InternalRow],
    info: MorOverlayInfo,
    route: String,
    // false for the non-first chunks of a size-sub-split route: they probe
    // the dead set like any split but must not re-emit the route's upserts
    emitUpserts: Boolean = true) extends PartitionReader[InternalRow] {

  private var current: InternalRow = _
  private val noDead = info.dead.isEmpty // insert-only delta sets skip the probe
  private val upIter: Iterator[Array[Any]] =
    if (!emitUpserts) Iterator.empty
    else if (route != null) info.upserts.getOrElse(route, Array.empty[Array[Any]]).iterator
    else info.upserts.valuesIterator.flatten

  override def next(): Boolean = {
    while (inner.next()) {
      val row = inner.get()
      if (noDead ||
          !info.dead.contains(MorOverlay.keyOf(row, info.keyIdx, info.types))) {
        current =
          if (info.identity) row
          else {
            // the key columns were pruned out of the caller's projection:
            // copy (the inner UnsafeRow buffer is reused) and re-project
            val c = row.copy()
            new GenericInternalRow(
              info.outIdx.map(i => c.get(i, info.types(i))))
          }
        return true
      }
    }
    if (upIter.hasNext) {
      val a = upIter.next()
      current = new GenericInternalRow(info.outIdx.map(i => a(i)))
      return true
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = inner.close()
}
