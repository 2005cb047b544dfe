package graft

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.catalog.{HashComponent, RangeBound, RangeComponent}
import graft.table.{GraftTable, PrimaryKeyException}

/** Row type for the events streaming replay (Q18/Q26). */
case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)

/**
 * The §2.6 declared correctness queries (SURVEY.md): each entry returns a
 * DataFrame whose rows/columns hash-match the DuckDB oracle SQL in
 * [[Queries.oracleSql]] over the same raw parquet tables. Scan queries go
 * through the engine read path (Tables.readonly → GraftTable.scan); mutation
 * queries script their ops on a fresh scratch table.
 */
object Queries {
  private val streamSeq = new AtomicInteger(0)

  /** q59's clustered fact table, one per (JVM, sfDir) — the query measures
    * the star join; the rewrite is q51's gate. */
  private val q59Fact = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** q64's warehouse, one per (JVM, sfDir) — catalog instances cache by
    * NAME, so gq64 must always resolve to one warehouse. */
  private val q64Wh = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val q70Wh = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val q82Wh = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** q46's warehouse (3 loaded+ANALYZEd dims), one per (JVM, sfDir). */
  private val q46Wh = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** events row count per (JVM, sfDir) — the replay harnesses (q26/q57/
    * q58) only size their chunking with it, and the raw testdata is
    * immutable, so one job per JVM suffices. */
  private val eventsCounts =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private def eventsCount(s: SparkSession, dir: String): Long =
    eventsCounts.computeIfAbsent(dir,
      _ => Tables.raw(s, dir, "events").count()).longValue

  /** q63's chunk boundaries (ts terciles + max) — a pure function of the
    * immutable raw events table, so one percentile job per (JVM, sfDir)
    * serves every bench iteration. */
  private val q63BoundsMemo =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long, Long)]()
  private def q63Bounds(s: SparkSession, dir: String): (Long, Long, Long) =
    q63BoundsMemo.computeIfAbsent(dir, _ => {
      val b = Tables.raw(s, dir, "events").agg(
        percentile_approx(unix_micros(col("ts")),
          array(lit(1.0 / 3), lit(2.0 / 3)), lit(10000)).as("qs"),
        max(unix_micros(col("ts"))).as("mx")).collect()(0)
      val Seq(b1, b2) = b.getSeq[Long](0)
      (b1, b2, b.getLong(1))
    })

  private def tmpLoc(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** Streaming checkpoint dir on tmpfs when available: offset/commit logs
    * fsync per micro-batch, which on the overlay filesystem costs a large
    * slice of the fixed per-batch latency. Callers delete it via [[rmrf]]
    * after stopping the query — durability is explicitly not needed for the
    * replay harness, and leaked tmpfs dirs are RAM on long-lived hosts. */
  private def ckptLoc(prefix: String): String = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    if (Files.isDirectory(shm) && Files.isWritable(shm))
      Files.createTempDirectory(shm, prefix).toString
    else tmpLoc(prefix)
  }

  private def rmrf(dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(dir)
    if (Files.exists(root))
      Files.walk(root).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.deleteIfExists(_))
  }

  /** Temporarily override shuffle parallelism (streaming micro-batches over
    * small replays drown in per-task overhead at the default). */
  private def withShufflePartitions[A](s: SparkSession, n: Int)(body: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, n.toString)
    try body finally s.conf.set(key, prev)
  }

  // Shorthand used throughout.
  private def scan(s: SparkSession, dir: String, t: String): DataFrame =
    Tables.scan(s, dir, t)

  /** Eagerly materialize a gate's FINAL (bounded) result as a local
    * relation: the rows compute NOW — under whatever conf scope / serving
    * registration the caller holds, exactly like the localCheckpoint(true)
    * this replaces — but without localCheckpoint's extra caching pass and
    * without pinning RDD blocks across bench iterations (round-12 saw a
    * pinned checkpoint inflate a later query). Gate results are
    * contract-bounded (point reads, group rows, small diffs), so the
    * collect is driver-safe. Only for RETURNED results — never for frames
    * a gate keeps processing distributed (a LocalRelation would change
    * downstream plan shapes that in-query asserts pin). */
  private def materialized(s: SparkSession, df: DataFrame): DataFrame = {
    import scala.jdk.CollectionConverters._
    s.createDataFrame(df.collect().toSeq.asJava, df.schema)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- scan-side operators -------------------------------------------
    "q1_scan_project" -> ((s, dir) => {
      scan(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "q2_mor_upsert_delete" -> ((s, dir) => {
      // Merge-on-read correctness: upsert a deterministic sample with
      // l_quantity+100, delete l_orderkey%97=0, scan (S3/S6).
      val t = Tables.scratch(s, dir, "lineitem")
      val mod = t.scanWithHidden().filter(col("l_orderkey") % 100 === 1)
        .withColumn("l_quantity", col("l_quantity") + 100)
      t.upsert(mod)
      t.deleteWhere(col("l_orderkey") % 97 === 0)
      t.scan().orderBy("l_orderkey", "l_linenumber")
    }),

    "q3_pushdown_agg" -> ((s, dir) => {
      scan(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R" && col("l_linestatus") === "F")
        .agg(count(lit(1)).as("cnt"),
          sum(col("l_extendedprice").cast("decimal(28,2)"))
            .cast("double").as("sum_price"))
    }),

    "q4_pk_range" -> ((s, dir) => {
      scan(s, dir, "orders")
        .filter(col("o_orderkey") >= 1000 && col("o_orderkey") < 2000)
        .orderBy("o_orderkey")
    }),

    "q5_limit" -> ((s, dir) => {
      scan(s, dir, "orders").select("o_orderkey").orderBy("o_orderkey").limit(100)
    }),

    "q6_count_only" -> ((s, dir) => {
      scan(s, dir, "lineitem").agg(count(lit(1)).as("cnt"))
    }),

    "q7_diff_scan" -> ((s, dir) => {
      // Diff scan (S11): changed rows between two snapshots as (pk, _deleted).
      val t = Tables.scratch(s, dir, "orders")
      val v1 = t.currentVersion
      t.upsert(t.scan().filter(col("o_orderkey") % 50 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1000))
      t.deleteWhere(col("o_orderkey") % 97 === 0)
      // changesSince = the delta-only fast path (no compaction separates the
      // two versions here, so it never falls back to the two-snapshot diff).
      t.changesSince(v1, t.currentVersion)
        .select(col("o_orderkey"), col("_deleted")).orderBy("o_orderkey")
    }),

    "q8_null_pred" -> ((s, dir) => {
      scan(s, dir, "events").agg(
        count(when(col("props").isNull, lit(1))).as("null_cnt"),
        count(col("props")).as("notnull_cnt"))
    }),

    "q9_in_list" -> ((s, dir) => {
      scan(s, dir, "customer")
        .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
        .agg(count(lit(1)).as("cnt"))
    }),

    "q10_semi_join" -> ((s, dir) => {
      // Bloom-filter predicate analog (P5): broadcast build side → semi join
      // runtime-filters the probe scan.
      val parts = scan(s, dir, "part").filter(col("p_size") === 5)
        .select(col("p_partkey").as("l_partkey"))
      scan(s, dir, "lineitem")
        .join(broadcast(parts), Seq("l_partkey"), "left_semi")
        .agg(count(lit(1)).as("cnt"))
    }),

    "q11_contradiction" -> ((s, dir) => {
      // Contradictory predicates fold to an empty relation (P6) — Catalyst
      // BooleanSimplification + PropagateEmptyRelation, no scan.
      scan(s, dir, "orders")
        .filter(col("o_orderkey") < 10 && col("o_orderkey") > 20)
        .agg(count(lit(1)).as("cnt"))
    }),

    "q12_prefix" -> ((s, dir) => {
      scan(s, dir, "part").filter(col("p_name").startsWith("sma"))
        .agg(count(lit(1)).as("cnt"))
    }),

    // ---- write/DDL operators -------------------------------------------
    "q13_create_insert" -> ((s, dir) => {
      val raw = Tables.raw(s, dir, "region")
      val t = GraftTable.create(s, tmpLoc("graft-q13-"), "region_q13",
        raw.schema, Seq("r_regionkey"), Seq(HashComponent(Seq("r_regionkey"), 2)))
      t.insert(raw)
      val dupRejected =
        try { t.insert(raw.limit(1)); false }
        catch { case _: PrimaryKeyException => true }
      if (!dupRejected)
        throw new IllegalStateException("INSERT of existing PK must fail (W1)")
      t.scan().orderBy("r_regionkey")
    }),

    "q14_insert_ignore" -> ((s, dir) => {
      val t = Tables.scratch(s, dir, "region")
      val modified = Tables.raw(s, dir, "region").withColumn("r_name",
        when(col("r_regionkey") <= 1, upper(col("r_name"))).otherwise(col("r_name")))
      t.insertIgnore(modified) // every PK exists → table unchanged
      t.scan().orderBy("r_regionkey")
    }),

    "q15_upsert" -> ((s, dir) => {
      val t = Tables.scratch(s, dir, "nation")
      t.upsert(t.scan().filter(col("n_nationkey") % 5 === 0)
        .withColumn("n_name", concat(col("n_name"), lit("_x"))))
      t.scan().orderBy("n_nationkey")
    }),

    "q16_update" -> ((s, dir) => {
      val t = Tables.scratch(s, dir, "customer")
      t.updateWhere(col("c_nationkey") === 7,
        Map("c_acctbal" -> (col("c_acctbal") * 1.1)))
      t.scan().orderBy("c_custkey")
    }),

    "q17_delete" -> ((s, dir) => {
      val t = Tables.scratch(s, dir, "orders")
      t.deleteWhere(col("o_orderstatus") === "F")
      t.scan().orderBy("o_orderkey")
    }),

    "q18_stream_upsert" -> ((s, dir) => {
      // Streaming upsert sink (W8, KuduSink analog): replay events in 10
      // micro-batches; batch b carries class-b rows plus overwrites of
      // class-(b-1) rows with value+1000 — last write wins per event_id.
      import s.implicits._
      import scala.jdk.CollectionConverters._
      val raw = Tables.raw(s, dir, "events")
      val t = GraftTable.create(s, tmpLoc("graft-q18-"), "events_q18",
        raw.schema, Seq("event_id"), Seq(HashComponent(Seq("event_id"), 4)))
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val ms = MemoryStream[Ev]
      s.conf.set("graft.delta.writePartitions", "1") // one file per micro-batch commit
      // 20k-row micro-batches: one task end-to-end beats any parallelism.
      val q18p = sys.props.getOrElse("graft.q18.partitions", "1").toInt
      val ckpt = ckptLoc("graft-q18-ckpt-")
      try withShufflePartitions(s, q18p) { // micro-batches are small; 32 tasks/batch is overhead
        val q = ms.toDF().writeStream
          .outputMode("update")
          .option("checkpointLocation", ckpt)
          .foreachBatch((batch: DataFrame, _: Long) => t.upsert(batch))
          .start()
        try {
          // Replay sorted by (class, id) through toLocalIterator: the
          // driver holds at most TWO classes (current batch + previous for
          // the overwrite derivation), not the whole table — the bounded
          // harness shape that survives a 100x events table.
          val it = raw.orderBy(pmod(col("event_id"), lit(10)), col("event_id"))
            .as[Ev].toLocalIterator().asScala
          var prev = Array.empty[Ev]
          val buf = scala.collection.mutable.ArrayBuffer[Ev]()
          def flush(b: Int): Unit = {
            val fresh = buf.toArray
            val overwrite =
              if (b == 0) Array.empty[Ev]
              else prev.map(e => e.copy(value = e.value + 1000))
            ms.addData(fresh ++ overwrite)
            q.processAllAvailable()
            prev = fresh
            buf.clear()
          }
          var cls = 0
          it.foreach { e =>
            val c = (e.event_id % 10).toInt
            while (cls < c) { flush(cls); cls += 1 }
            buf += e
          }
          while (cls < 10) { flush(cls); cls += 1 }
        } finally q.stop()
      } finally {
        s.conf.unset("graft.delta.writePartitions")
        rmrf(ckpt)
      }
      t.scan().orderBy("event_id")
    }),

    "q19_schema_evolution" -> ((s, dir) => {
      val t = Tables.scratch(s, dir, "customer")
      t.addColumn("c_tier", StringType, nullable = false, default = Some("basic"))
      t.renameColumn("c_name", "c_fullname")
      t.dropColumn("c_acctbal")
      t.scan().orderBy("c_custkey")
    }),

    // ---- relational pass-through over engine tables --------------------
    "q20_join_agg" -> ((s, dir) => {
      val cust = scan(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = scan(s, dir, "orders")
        .filter(col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")))
      val li = scan(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(28,6)")).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate")
    }),

    "q21_tpch_q1" -> ((s, dir) => {
      // Money aggregates: sum in DECIMAL (order-independent), cast to
      // double, then round(…, 2|4) — once a sum's unscaled value passes
      // 2^53 the decimal→double conversions of the two engines can differ
      // by 1 ulp, and the rounding makes the hash compare robust to that
      // (Spark HALF_UP and DuckDB half-away-from-zero agree on doubles:
      // both see the same binary value, and binary midpoints round
      // identically under either rule for the same sign).
      val dec2 = (c: String) => col(c).cast("decimal(28,2)")
      val li = scan(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(dec2("l_quantity")).cast("double"), 2).as("sum_qty"),
          round(sum(dec2("l_extendedprice")).cast("double"), 2).as("sum_base_price"),
          round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(28,6)")).cast("double"), 2).as("sum_disc_price"),
          round(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))
            * (lit(1) + col("l_tax"))).cast("decimal(28,6)")).cast("double"), 2).as("sum_charge"),
          round(sum(dec2("l_quantity")).cast("double") / count(lit(1)), 4).as("avg_qty"),
          round(sum(dec2("l_extendedprice")).cast("double") / count(lit(1)), 4).as("avg_price"),
          round(sum(col("l_discount").cast("decimal(28,4)")).cast("double")
            / count(lit(1)), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    "q22_window" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey"))
      scan(s, dir, "orders")
        .select("o_custkey", "o_orderkey", "o_orderdate")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    }),

    "q23_set_ops" -> ((s, dir) => {
      val o = scan(s, dir, "orders")
      val a = o.filter(col("o_orderkey").between(0, 1000)).select("o_orderkey")
      val b = o.filter(col("o_orderkey").between(500, 1500)).select("o_orderkey")
      a.intersect(b).withColumn("tag", lit("i"))
        .unionByName(a.except(b).withColumn("tag", lit("e")))
        .orderBy("tag", "o_orderkey")
    }),

    "q24_rollup" -> ((s, dir) => {
      scan(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }),

    "q25_scalar" -> ((s, dir) => {
      scan(s, dir, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("o_year"),
        month(col("o_orderdate")).as("o_month"),
        floor(col("o_totalprice")).as("price_floor"),
        abs(col("o_totalprice") - 1000.0).as("price_dist"),
        substring(col("o_orderpriority"), 1, 3).as("prio3"))
        .orderBy("o_orderkey")
    }),

    "q25_array" -> ((s, dir) => {
      scan(s, dir, "embeddings").select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        element_at(col("embedding"), 1).as("first_val"),
        col("label"))
        .orderBy("vec_id")
    }),

    "q26_stream_window" -> ((s, dir) => {
      // Tumbling 1-hour counts per event_type with a 15-min watermark
      // (Structured Streaming; chronological replay → nothing late-dropped;
      // a far-future sentinel batch flushes the last windows in append mode).
      import s.implicits._
      import scala.jdk.CollectionConverters._
      val raw = Tables.raw(s, dir, "events")
      val total = eventsCount(s, dir)
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val ms = MemoryStream[Ev]
      val sinkName = s"graft_q26_sink_${streamSeq.incrementAndGet()}"
      // ~3600 state keys total → 2 partitions; 8+ drowns in per-task overhead
      val q26p = sys.props.getOrElse("graft.q26.partitions", "2").toInt
      // With no-data micro-batches on, every chunk runs a SECOND (empty)
      // batch just to advance the watermark — double the fixed per-batch
      // cost for nothing during a chronological replay. Turn them off and
      // flush the final windows with two far-future sentinels instead (the
      // first advances max event time, the second applies the new watermark
      // and emits).
      val ndKey = "spark.sql.streaming.noDataMicroBatches.enabled"
      val ndPrev = s.conf.get(ndKey)
      s.conf.set(ndKey, "false")
      val ckpt = ckptLoc("graft-q26-ckpt-")
      try withShufflePartitions(s, q26p) { // per-batch state-store task count dominates
        val q = ms.toDF()
          .withWatermark("ts", "15 minutes")
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .count()
          .writeStream.format("memory").queryName(sinkName).outputMode("append")
          .option("checkpointLocation", ckpt)
          .start()
        try {
          // 6 chronological chunks: enough watermark progression to
          // exercise append-mode emission mid-stream; per-micro-batch fixed
          // cost (state store + commit log) is the dominant term, so the
          // chunk count is the knob — the final windowed counts are
          // identical for any chunking of a chronological replay. The
          // sorted replay streams through toLocalIterator: the driver
          // holds ONE chunk, not the table (bounded at 100x the data).
          val chunk = math.max(1L, total / 6).toInt
          var maxTs = 0L
          Tables.raw(s, dir, "events").orderBy("ts").as[Ev]
            .toLocalIterator().asScala.grouped(chunk).foreach { batch =>
              maxTs = batch.last.ts.getTime
              ms.addData(batch)
              q.processAllAvailable()
            }
          val lastTs = new java.sql.Timestamp(maxTs + 2 * 3600 * 1000)
          ms.addData(Ev(-1L, lastTs, -1L, "zz_sentinel", 0.0, null))
          q.processAllAvailable()
          ms.addData(Ev(-2L, new java.sql.Timestamp(lastTs.getTime + 3600 * 1000),
            -1L, "zz_sentinel", 0.0, null))
          q.processAllAvailable()
        } finally q.stop()
      } finally {
        s.conf.set(ndKey, ndPrev)
        rmrf(ckpt)
      }
      s.table(sinkName)
        .filter(col("event_type") =!= "zz_sentinel")
        .select(col("window.start").as("window_start"), col("event_type"),
          col("count").as("cnt"))
        .orderBy("window_start", "event_type")
    }),

    "q57_stream_dedup" -> ((s, dir) => {
      // Streaming ingest DEDUP — the at-least-once reality of a
      // training-data firehose: retries and replays deliver exact
      // duplicate records, and the ingest layer must drop them online.
      // dropDuplicates over (key, event-time) WITH a watermark bounds the
      // dedup state: keys older than the watermark evict, so the operator
      // runs forever at constant memory (unbounded-state dropDuplicates
      // would eat the cluster on a 100 TB stream). The replay appends an
      // exact copy of every 7th event to its own chunk — duplicates
      // arrive at their original event time, safely inside the bound —
      // and the gate hash-matches the deduped stream against the
      // original table (a missed dup = extra rows = mismatch).
      import s.implicits._
      import scala.jdk.CollectionConverters._
      val raw = Tables.raw(s, dir, "events")
      val total = eventsCount(s, dir)
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val ms = MemoryStream[Ev]
      val sinkName = s"graft_q57_sink_${streamSeq.incrementAndGet()}"
      val q57p = sys.props.getOrElse("graft.q57.partitions", "2").toInt
      val ndKey = "spark.sql.streaming.noDataMicroBatches.enabled"
      val ndPrev = s.conf.get(ndKey)
      s.conf.set(ndKey, "false")
      val ckpt = ckptLoc("graft-q57-ckpt-")
      try withShufflePartitions(s, q57p) {
        val q = ms.toDF()
          .withWatermark("ts", "15 minutes")
          .dropDuplicates("event_id", "ts")
          .select("event_id", "ts", "user_id", "event_type")
          .writeStream.format("memory").queryName(sinkName).outputMode("append")
          .option("checkpointLocation", ckpt)
          .start()
        try {
          val chunk = math.max(1L, total / 6).toInt
          raw.orderBy("ts").as[Ev]
            .toLocalIterator().asScala.grouped(chunk).foreach { batch =>
              val dupes = batch.filter(_.event_id % 7 == 0)
              ms.addData(batch ++ dupes)
              q.processAllAvailable()
            }
        } finally q.stop()
      } finally {
        s.conf.set(ndKey, ndPrev)
        rmrf(ckpt)
      }
      s.table(sinkName).orderBy("event_id")
    }),

    "q58_stream_enrich" -> ((s, dir) => {
      // Stream-STATIC enrichment join — the metadata-attach step of a
      // streaming ingest (each firehose event gains its dimension
      // attributes on the way in). The static side is an ENGINE table
      // scan, so partition pruning/zone maps apply inside every
      // micro-batch and the dim always serves its latest snapshot;
      // Spark broadcasts it under the join threshold, making each batch
      // a stateless map-side join — no watermark, no state store, pure
      // per-batch cost at any stream length.
      import s.implicits._
      import scala.jdk.CollectionConverters._
      val raw = Tables.raw(s, dir, "events")
      val total = eventsCount(s, dir)
      val dim = Tables.scan(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val ms = MemoryStream[Ev]
      val sinkName = s"graft_q58_sink_${streamSeq.incrementAndGet()}"
      val q58p = sys.props.getOrElse("graft.q58.partitions", "2").toInt
      val ckpt = ckptLoc("graft-q58-ckpt-")
      try withShufflePartitions(s, q58p) {
        val stream = ms.toDF()
        val q = stream.join(dim, stream("user_id") === dim("c_custkey"))
          .select("event_id", "ts", "user_id", "c_mktsegment", "value")
          .writeStream.format("memory").queryName(sinkName).outputMode("append")
          .option("checkpointLocation", ckpt)
          .start()
        try {
          val chunk = math.max(1L, total / 4).toInt
          raw.orderBy("ts").as[Ev]
            .toLocalIterator().asScala.grouped(chunk).foreach { batch =>
              ms.addData(batch)
              q.processAllAvailable()
            }
        } finally q.stop()
      } finally rmrf(ckpt)
      s.table(sinkName).orderBy("event_id")
    }),

    "q28_range_drop" -> ((s, dir) => {
      // ADD/DROP RANGE PARTITION (the D2 retention pattern,
      // AlterTableOptions.java:362-394): drop the 1995 range — metadata-only,
      // its base file group leaves the fileset without being read — then
      // verify a write into the dropped range errors (non-covered range),
      // re-add the range, and upsert one 1995 order back.
      val t = Tables.scratch(s, dir, "orders")
      val first1995 = Tables.raw(s, dir, "orders")
        .filter(year(col("o_orderdate")) === 1995)
        .orderBy("o_orderkey").limit(1)
      t.dropRangePartition("1995")
      val rejected =
        try { t.upsert(first1995); false }
        catch { case _: PrimaryKeyException => true }
      if (!rejected)
        throw new IllegalStateException("write to a dropped range must fail (D2)")
      t.addRangePartition("1995")
      t.upsert(first1995)
      t.scan().orderBy("o_orderkey")
    }),

    "q31_range_bounds" -> ((s, dir) => {
      // Explicit [lower, upper) range bounds (D2's other half —
      // CreateTableOptions.addRangePartition, AlterTableOptions.java:321-394):
      // unequal widths (open-ended early/late around a two-year mid), drop
      // the mid bound (metadata-only file-group removal), verify a write
      // into the now-uncovered interval errors, re-cover 1995 with a
      // NARROWER bound, and upsert the earliest 1995 order back.
      val raw = Tables.raw(s, dir, "orders")
      val t = GraftTable.create(s, tmpLoc("graft-q31-"), "orders_q31",
        raw.schema, Seq("o_orderkey"), Seq(HashComponent(Seq("o_orderkey"), 4)),
        range = Some(RangeComponent("o_orderdate", "value", bounds = Some(Seq(
          RangeBound("early", None, Some("1995-01-01 00:00:00")),
          RangeBound("mid", Some("1995-01-01 00:00:00"), Some("1997-01-01 00:00:00")),
          RangeBound("late", Some("1997-01-01 00:00:00"), None))))),
        data = Some(raw))
      t.dropRangeBound("mid")
      val first1995 = raw.filter(year(col("o_orderdate")) === 1995)
        .orderBy("o_orderkey").limit(1)
      val rejected =
        try { t.upsert(first1995); false }
        catch { case _: PrimaryKeyException => true }
      if (!rejected)
        throw new IllegalStateException("write into a dropped bound must fail (D2)")
      t.addRangeBound("y1995", Some("1995-01-01 00:00:00"), Some("1996-01-01 00:00:00"))
      t.upsert(first1995)
      t.scan().orderBy("o_orderkey")
    }),

    "q54_backup_chain" -> ((s, dir) => {
      // E3 end-to-end as a HASH-GATED query (the spec already covers the
      // mechanics; this gates the full round trip against the oracle):
      // full backup → two mutation generations, each captured as an
      // incremental (kudu-backup's RowAction export) → restoreChain
      // replays them IN ORDER into a fresh table. The replay order is
      // load-bearing: gen-1 updates the %3 keys and deletes the %7 keys;
      // gen-2 re-inserts the %7 keys at +500 and deletes the %3 keys —
      // swapped increments would leave the opposite key classes alive.
      import graft.tools.GraftTools
      withShufflePartitions(s, 4) { // ~13 tiny commit/probe jobs: 32-task
      // shuffles are pure scheduling floor at this table size
      val raw = Tables.raw(s, dir, "supplier")
      val t = GraftTable.create(s, tmpLoc("graft-q54-src-"), "supplier_q54",
        raw.schema, Seq("s_suppkey"), Seq(HashComponent(Seq("s_suppkey"), 4)),
        data = Some(raw))
      val full = tmpLoc("graft-q54-full-")
      GraftTools.backup(t, full)
      val v1 = t.currentVersion
      // each generation commits as ONE transactional version (the chain
      // also proves increments capture multi-op atomic commits correctly)
      t.transaction { tx =>
        tx.upsert(raw.filter(pmod(col("s_suppkey"), lit(10)) === 3)
          .withColumn("s_acctbal", col("s_acctbal") + 100))
        tx.delete(raw.filter(pmod(col("s_suppkey"), lit(10)) === 7)
          .select("s_suppkey"))
      }
      val inc1 = tmpLoc("graft-q54-inc1-")
      val h1 = GraftTools.backupIncremental(t, inc1, v1)
      t.transaction { tx =>
        tx.upsert(raw.filter(pmod(col("s_suppkey"), lit(10)) === 7)
          .withColumn("s_acctbal", col("s_acctbal") + 500))
        tx.delete(raw.filter(pmod(col("s_suppkey"), lit(10)) === 3)
          .select("s_suppkey"))
      }
      val inc2 = tmpLoc("graft-q54-inc2-")
      GraftTools.backupIncremental(t, inc2, h1)
      val restored = GraftTools.restoreChain(s, full, Seq(inc1, inc2),
        tmpLoc("graft-q54-dest-"), Seq("s_suppkey"),
        Seq(HashComponent(Seq("s_suppkey"), 4)))
      // materialize INSIDE the 4-partition scope (the lambda's return is
      // lazy — unmaterialized, the final probe would shuffle at the
      // restored session default); 90 rows, leak-free
      materialized(s, restored.scan()).orderBy("s_suppkey")
      } // withShufflePartitions
    }),

    "q55_replicate" -> ((s, dir) => {
      // E6 end-to-end as a HASH-GATED query: destination bootstraps from
      // the source's v1 snapshot (the change stream never emits the
      // initial load), then TWO replication rounds relay the CDC deltas —
      // the second resumes from the head the first returned, proving the
      // chain handoff. Gen-1 updates %4 keys and deletes %9 keys; gen-2
      // re-inserts %9 at +750 and deletes %4.
      import graft.tools.GraftTools
      withShufflePartitions(s, 4) { // tiny commit/probe jobs, as q54
      val raw = Tables.raw(s, dir, "customer")
      val src = GraftTable.create(s, tmpLoc("graft-q55-src-"), "customer_q55",
        raw.schema, Seq("c_custkey"), Seq(HashComponent(Seq("c_custkey"), 4)),
        data = Some(raw))
      val v1 = src.currentVersion
      val dest = GraftTable.create(s, tmpLoc("graft-q55-dest-"),
        "customer_q55_replica", raw.schema, Seq("c_custkey"),
        Seq(HashComponent(Seq("c_custkey"), 4)), data = Some(src.scan(Some(v1))))
      src.transaction { tx =>
        tx.upsert(raw.filter(pmod(col("c_custkey"), lit(10)) === 4)
          .withColumn("c_acctbal", col("c_acctbal") + 250))
        tx.delete(raw.filter(pmod(col("c_custkey"), lit(10)) === 9)
          .select("c_custkey"))
      }
      val h1 = GraftTools.replicate(src, dest, v1)
      src.transaction { tx =>
        tx.upsert(raw.filter(pmod(col("c_custkey"), lit(10)) === 9)
          .withColumn("c_acctbal", col("c_acctbal") + 750))
        tx.delete(raw.filter(pmod(col("c_custkey"), lit(10)) === 4)
          .select("c_custkey"))
      }
      GraftTools.replicate(src, dest, h1)
      // materialized inside the scope, as q54
      materialized(s, dest.scan()).orderBy("c_custkey")
      } // withShufflePartitions
    }),

    "q64_ctas" -> ((s, dir) => {
      // Atomic CTAS + RTAS through the V2 StagingTableCatalog: the table
      // materializes under .staging and publishes by atomic move, so a
      // mid-write failure can never leave a half table (and a failed
      // REPLACE keeps the incumbent — CtasSpec proves the failure
      // interleavings; this gates the happy path against the oracle).
      // Warehouse memoized per (JVM, sfDir): catalog INSTANCES cache by
      // name, so the name must always see one warehouse.
      val wh = q64Wh.computeIfAbsent(dir, _ => tmpLoc("graft-q64-wh-"))
      s.conf.set("spark.sql.catalog.gq64",
        classOf[graft.sources.v2.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gq64.warehouse", wh)
      Tables.raw(s, dir, "orders").createOrReplaceTempView("q64_orders_raw")
      s.sql(
        "CREATE OR REPLACE TABLE gq64.ord_sum PARTITIONED BY (bucket(4, o_custkey)) " +
          "TBLPROPERTIES ('graft.keys' = 'o_custkey') AS " +
          "SELECT o_custkey, count(*) AS n_orders " +
          "FROM q64_orders_raw GROUP BY o_custkey")
      // RTAS replaces schema AND data atomically (adds the price rollup)
      s.sql(
        "REPLACE TABLE gq64.ord_sum PARTITIONED BY (bucket(4, o_custkey)) " +
          "TBLPROPERTIES ('graft.keys' = 'o_custkey') AS " +
          "SELECT o_custkey, count(*) AS n_orders, " +
          "round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE), 2) AS sum_price " +
          "FROM q64_orders_raw GROUP BY o_custkey")
      s.table("gq64.ord_sum").orderBy("o_custkey")
    }),

    "q65_upsert_ignore_immutable" -> ((s, dir) => {
      // W6 hash-gated (was the last spec-only mutation row): UPSERT_IGNORE
      // silently preserves IMMUTABLE columns on existing rows instead of
      // erroring (row_operations.proto:43 UPSERT_IGNORE + ColumnSchemaPB
      // immutable) while non-immutable columns update and NEW rows insert
      // whole — the reference's use case is backfill jobs that must never
      // clobber an authoritative column. The oracle reconstructs the exact
      // end state in SQL: existing rows keep s_name (the immutable) and
      // take the +100 balance; fresh keys land verbatim.
      val raw = Tables.raw(s, dir, "supplier")
      val t = GraftTable.create(s, tmpLoc("graft-q65-"), "supplier_q65",
        raw.schema, Seq("s_suppkey"), Seq(HashComponent(Seq("s_suppkey"), 4)),
        data = Some(raw))
      t.setImmutable("s_name")
      val existing = raw.filter(col("s_suppkey") % 5 === 0)
        .withColumn("s_name", lit("MUST_NOT_LAND"))
        .withColumn("s_acctbal", col("s_acctbal") + 100)
      val fresh = raw.filter(col("s_suppkey") % 7 === 0)
        .withColumn("s_suppkey", col("s_suppkey") + 1000000L)
        .withColumn("s_name", concat(lit("NEW_"), col("s_name")))
        .withColumn("s_acctbal", lit(1.5))
      t.upsertIgnore(existing.unionByName(fresh))
      t.scan().orderBy("s_suppkey")
    }),

    "q67_trash_recall" -> ((s, dir) => {
      // D3 hash-gated (was spec-only): the soft-delete lifecycle
      // (catalog_manager.h:701,723 — soft_deleted tables with a reserve
      // window, recallable until it expires). A mutated table is trashed:
      // it must refuse load(), vanish from SHOW TABLES, refuse SQL reads,
      // and survive an in-window purge attempt; recall() restores it and
      // the MERGE-ON-READ scan of the recalled table — base plus the
      // pre-trash deltas — hash-matches the oracle. Any lifecycle drift
      // (lost deltas, early purge, ghost visibility) breaks the compare
      // or the in-query gates.
      val raw = Tables.raw(s, dir, "nation")
      val loc = tmpLoc("graft-q67-")
      val t = GraftTable.create(s, loc, "nation_q67", raw.schema,
        Seq("n_nationkey"), Seq(HashComponent(Seq("n_nationkey"), 2)),
        data = Some(raw))
      t.upsert(raw.filter(col("n_nationkey") % 4 === 0)
        .withColumn("n_name", concat(col("n_name"), lit("_T"))))
      GraftTable.softDrop(loc)
      if (!GraftTable.isTrashed(loc))
        throw new IllegalStateException("softDrop must mark the table")
      val refused =
        try { GraftTable.load(s, loc); false }
        catch { case _: IllegalArgumentException => true }
      if (!refused)
        throw new IllegalStateException("a trashed table must refuse load()")
      val f = new java.io.File(loc)
      s.conf.set("spark.sql.catalog.gq67",
        classOf[graft.sources.v2.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gq67.warehouse", f.getParent)
      if (s.sql("SHOW TABLES IN gq67").collect()
          .exists(_.getString(1) == f.getName))
        throw new IllegalStateException(
          "a trashed table must vanish from SHOW TABLES")
      val sqlRefused =
        try { s.table(s"gq67.`${f.getName}`").count(); false }
        catch { case _: org.apache.spark.sql.AnalysisException => true }
      if (!sqlRefused)
        throw new IllegalStateException("a trashed table must refuse SQL reads")
      if (GraftTable.purgeIfExpired(loc))
        throw new IllegalStateException(
          "purge inside the reserve window must be a no-op")
      GraftTable.recall(loc)
      GraftTable.load(s, loc).scan().orderBy("n_nationkey")
    }),

    "q66_locate_row" -> ((s, dir) => {
      // D6 hash-gated (was spec-only): key→tablet location
      // (Partitioner.partitionRow / `kudu table locate_row`) verified
      // against PHYSICAL placement — for a deterministic key sample,
      // locateRow's metadata-only answer must name exactly the bucket
      // whose base files hold the row (the files carry their bucket as a
      // column), and each key must live in exactly one bucket. The raw
      // bucket ids are engine-specific (murmur3), so the gated shape is
      // the VERIFIED booleans per key — any routing drift hashes false.
      import s.implicits._
      val raw = Tables.raw(s, dir, "supplier")
      val t = GraftTable.create(s, tmpLoc("graft-q66-"), "supplier_q66",
        raw.schema, Seq("s_suppkey"), Seq(HashComponent(Seq("s_suppkey"), 4)),
        data = Some(raw))
      val sample = raw.select("s_suppkey")
        .filter(pmod(col("s_suppkey"), lit(9)) === 0)
        .as[Long].collect().sorted.take(40) // bounded driver sample
      val pred = sample.toSeq.map { k =>
        (k, t.locateRow(Map("s_suppkey" -> k.toString))._1.getOrElse(
          throw new IllegalStateException(s"locate_row found no bucket for $k"))
          .toLong)
      }.toDF("s_suppkey", "pred_b")
      // the bucket is a PARTITION directory (…/_b=N/part-…): read the base
      // dirs so partition discovery materializes it as a column
      val baseDirs = t.meta.baseFiles.map { f =>
        val i = f.path.indexOf("/_b=")
        if (i < 0) throw new IllegalStateException(s"unbucketed base: ${f.path}")
        f.path.substring(0, i)
      }.distinct
      val phys = s.read.parquet(baseDirs: _*)
        .select(col("s_suppkey"), col("_b").cast("long").as("_b"))
      pred.join(phys, "s_suppkey")
        .groupBy(col("s_suppkey"), col("pred_b"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("_b") === col("pred_b"), 1L).otherwise(0L)).as("hits"),
          countDistinct(col("_b")).as("nb"))
        .select(col("s_suppkey"),
          (col("hits") === col("n") && col("n") >= 1).as("in_located"),
          (col("nb") === 1).as("unique_placement"))
        .orderBy("s_suppkey")
    }),

    "q68_incr_rollup" -> ((s, dir) => {
      // Incremental materialized-view maintenance (MaterializedRollup):
      // a persisted GROUP BY rollup of a mutating base stays current with
      // work proportional to the TOUCHED GROUPS — the refresh reads only
      // the CDC since its watermark (S11), recomputes exactly the touched
      // groups from the live base through an IN-list-pruned scan
      // (assertPrune: the base is range-partitioned on the group column,
      // so untouched groups' files never open — S8/P4), and commits
      // upserts + vanished-group tombstones as ONE transaction (W9). The
      // mutations exercise all three refresh faces: changed aggregates
      // (1-URGENT repriced), a vanished group (5-LOW deleted whole), and
      // a brand-new group (9-SYNTH inserted). The gated result is the
      // refreshed rollup TABLE itself vs the oracle's full recompute.
      val raw = Tables.raw(s, dir, "orders")
      val t = GraftTable.create(s, tmpLoc("graft-q68b-"), "orders_q68",
        raw.schema, Seq("o_orderpriority", "o_orderkey"),
        Seq(HashComponent(Seq("o_orderkey"), 2)),
        range = Some(RangeComponent("o_orderpriority", "value")),
        data = Some(raw))
      val rollup = graft.tools.MaterializedRollup.build(s, t,
        Seq("o_orderpriority"), Seq(
          "n_rows" -> "count(*)",
          "sum_price" -> "sum(CAST(o_totalprice AS DECIMAL(28,2)))",
          "max_key" -> "max(o_orderkey)"),
        tmpLoc("graft-q68r-"), buckets = 4)
      // all three mutation faces in ONE atomic commit (W9) — the refresh
      // sees one version either way, and the gate pays one commit job
      // instead of three
      withShufflePartitions(s, 4) {
        t.transaction { txn =>
          txn.upsert(t.scan()
            .filter(col("o_orderpriority") === "1-URGENT" &&
              col("o_orderkey") % 7 === 0)
            .withColumn("o_totalprice", col("o_totalprice") * 2))
          txn.delete(t.scan().filter(col("o_orderpriority") === "5-LOW")
            .select("o_orderpriority", "o_orderkey"))
          txn.insert(raw.filter(col("o_orderkey") % 11 === 0)
            .withColumn("o_orderkey", col("o_orderkey") + lit(10000000L))
            .withColumn("o_orderpriority", lit("9-SYNTH"))
            .withColumn("o_totalprice", (col("o_orderkey") % 1000).cast("double")))
        }
        if (!graft.tools.MaterializedRollup.refresh(s, rollup, assertPrune = true))
          throw new IllegalStateException(
            "refresh must apply the pending mutations")
      }
      // house rule (see q21): money aggregates gate as round(CAST(d), 2) —
      // the decimal→double conversions of the two engines can differ on a
      // raw DECIMAL column; RollupRewriteSpec keeps the decimal-exact check
      rollup.scan()
        .withColumn("sum_price", round(col("sum_price").cast("double"), 2))
        .orderBy("o_orderpriority")
    }),

    "q69_secondary_lookup" -> ((s, dir) => {
      // Maintained SECONDARY INDEX (SecondaryIndex): point lookups on a
      // non-key column without scanning the base — the index is an engine
      // table keyed (value, pk) hash-partitioned on the value, the probe
      // pushes an IN-list that prunes whole hash buckets (assertPrune:
      // ≤ half the index files open), and the base read rides its own PK
      // layout for the matched keys. The refresh rides the CDC: a renamed
      // customer's OLD name entry tombstones and the new one appears, a
      // deleted customer leaves the index, an inserted one joins it — so
      // the lookup batch (current names + two STALE names) must return
      // exactly the three live rows.
      val raw = Tables.raw(s, dir, "customer")
      val t = GraftTable.create(s, tmpLoc("graft-q69b-"), "customer_q69",
        raw.schema, Seq("c_custkey"),
        Seq(HashComponent(Seq("c_custkey"), 4)), data = Some(raw))
      val idx = graft.tools.SecondaryIndex.build(s, t, "c_name",
        tmpLoc("graft-q69i-"), buckets = 16)
      // rename + delete + insert as ONE atomic commit (W9): the index
      // refresh reads one CDC version carrying all three faces, and the
      // gate pays one commit job instead of three
      withShufflePartitions(s, 4) {
        t.transaction { txn =>
          txn.upsert(t.scan().filter(col("c_custkey") === 42)
            .withColumn("c_name", lit("RENAMED#000000042")))
          txn.delete(t.scan().filter(col("c_custkey") === 99)
            .select("c_custkey"))
          txn.insert(t.scan().filter(col("c_custkey") === 7)
            .withColumn("c_custkey", lit(10000001L))
            .withColumn("c_name", lit("SYNTH#000000001")))
        }
        if (!graft.tools.SecondaryIndex.refresh(s, idx))
          throw new IllegalStateException(
            "refresh must apply the pending mutations")
      }
      graft.tools.SecondaryIndex.lookup(s, idx, Seq(
        "Customer#000000007", "RENAMED#000000042", "SYNTH#000000001",
        "Customer#000000099", "Customer#000000042"), assertPrune = true)
        .orderBy("c_custkey")
    }),

    "q71_index_rewrite" -> ((s, dir) => {
      // Transparent index-accelerated point predicate (IndexRewrite): a
      // plain WHERE on an indexed NON-key column is served through the
      // secondary index — the plan-time bounded probe prunes index hash
      // buckets, the spliced base read prunes PK buckets, and no explicit
      // lookup call appears anywhere. In-query asserts pin the contract:
      // (1) the fresh index serves (the filter plan reads a STRICT SUBSET
      // of the base files); (2) the instant the base mutates the rewrite
      // declines — a stale index NEVER serves; (3) after an incremental
      // refresh the V2 catalog path serves again even though the base is
      // still delta-dirty (the lookup's base read folds merge-on-read
      // state itself). Gated rows = the point-query result vs the
      // oracle's direct filter over the mutated base.
      import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
      val raw = Tables.raw(s, dir, "customer")
      val t = GraftTable.create(s, tmpLoc("graft-q71b-"), "customer_q71",
        raw.schema, Seq("c_custkey"),
        Seq(HashComponent(Seq("c_custkey"), 4)), data = Some(raw))
      val idx = graft.tools.SecondaryIndex.build(s, t, "c_name",
        tmpLoc("graft-q71i-"), buckets = 16) // build auto-arms the rewrite
      try {
        def servedSubset(df: DataFrame): Boolean = {
          val baseFiles = t.meta.baseFiles.map(f =>
            new org.apache.hadoop.fs.Path(f.path).toUri.getPath).toSet
          val read = df.queryExecution.optimizedPlan.collect {
            case lr: LogicalRelation => lr.relation match {
              case fs: HadoopFsRelation =>
                fs.location.rootPaths.map(_.toUri.getPath)
                  .filter(baseFiles.contains)
              case _ => Nil
            }
          }.flatten.toSet
          read.nonEmpty && read.size < baseFiles.size
        }
        def q1 = t.scan().filter(col("c_name") === "Customer#000000011")
        if (!servedSubset(q1))
          throw new IllegalStateException(
            "a fresh index must serve the point predicate through a pruned read")
        withShufflePartitions(s, 4) {
          t.upsert(t.scan().filter(col("c_custkey") === 11)
            .withColumn("c_name", lit("RENAMED#000000011")))
        }
        if (servedSubset(q1))
          throw new IllegalStateException("a STALE index must never serve")
        if (!graft.tools.SecondaryIndex.refresh(s, idx))
          throw new IllegalStateException("refresh must apply the mutation")
        val f = new java.io.File(t.location)
        s.conf.set("spark.sql.catalog.gq71",
          classOf[graft.sources.v2.GraftCatalog].getName)
        s.conf.set("spark.sql.catalog.gq71.warehouse", f.getParent)
        val v2 = s.table(s"gq71.`${f.getName}`")
          .filter(col("c_name").isin("RENAMED#000000011",
            "Customer#000000042", "Customer#000000011"))
        if (!servedSubset(v2))
          throw new IllegalStateException(
            "a refreshed index must serve the V2 path on a dirty base")
        withShufflePartitions(s, 4) { materialized(s, v2) }
          .orderBy("c_custkey")
      } finally graft.plans.IndexRewrite.disable(s, idx.location)
    }),

    "q72_index_range" -> ((s, dir) => {
      // RANGE predicate served through the secondary index (IndexRewrite
      // + SecondaryIndex.lookupWhere): `c_name BETWEEN lo AND hi` on an
      // indexed NON-key column splices a bounded interval probe — the two
      // bounds MERGE into one probe (never an unbounded `>= lo` alone),
      // the index prunes by per-file zone maps under its hash(value)
      // layout, and the matched keys read the base through PK pruning.
      // The reference can range-scan KEY columns only (tablet/
      // cfile_set.cc:396 PushdownRangeScanPredicate); this extends the
      // same posture to non-key columns it can only full-scan. In-query
      // asserts pin the contract exactly like q71: fresh serves (strict
      // subset of base files read), stale NEVER serves, a refresh restores
      // serving on the still-dirty base through the V2 path.
      import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
      val raw = Tables.raw(s, dir, "customer")
      val t = GraftTable.create(s, tmpLoc("graft-q72b-"), "customer_q72",
        raw.schema, Seq("c_custkey"),
        Seq(HashComponent(Seq("c_custkey"), 4)), data = Some(raw))
      val idx = graft.tools.SecondaryIndex.build(s, t, "c_name",
        tmpLoc("graft-q72i-"), buckets = 16)
      try {
        def servedSubset(df: DataFrame): Boolean = {
          val baseFiles = t.meta.baseFiles.map(f =>
            new org.apache.hadoop.fs.Path(f.path).toUri.getPath).toSet
          val read = df.queryExecution.optimizedPlan.collect {
            case lr: LogicalRelation => lr.relation match {
              case fs: HadoopFsRelation =>
                fs.location.rootPaths.map(_.toUri.getPath)
                  .filter(baseFiles.contains)
              case _ => Nil
            }
          }.flatten.toSet
          read.nonEmpty && read.size < baseFiles.size
        }
        // a NARROW interval (3 keys over 4 PK buckets) so the strict-subset
        // plan assert is deterministic; fixed-width TPC-H names make the
        // lexicographic range exact at any SF
        def rangeCond = col("c_name") >= "Customer#000000010" &&
          col("c_name") <= "Customer#000000012"
        def q1 = t.scan().filter(rangeCond)
        if (!servedSubset(q1))
          throw new IllegalStateException(
            "a fresh index must serve the range predicate through a pruned read")
        withShufflePartitions(s, 4) {
          t.upsert(t.scan().filter(col("c_custkey") === 11)
            .withColumn("c_name", lit("ZZZ#000000011")))
        }
        if (servedSubset(q1))
          throw new IllegalStateException("a STALE index must never serve a range")
        if (!graft.tools.SecondaryIndex.refresh(s, idx))
          throw new IllegalStateException("refresh must apply the mutation")
        val f = new java.io.File(t.location)
        s.conf.set("spark.sql.catalog.gq72",
          classOf[graft.sources.v2.GraftCatalog].getName)
        s.conf.set("spark.sql.catalog.gq72.warehouse", f.getParent)
        val v2 = s.table(s"gq72.`${f.getName}`").filter(rangeCond)
        if (!servedSubset(v2))
          throw new IllegalStateException(
            "a refreshed index must serve the range on the V2 path of a dirty base")
        withShufflePartitions(s, 4) { materialized(s, v2) }
          .orderBy("c_custkey")
      } finally graft.plans.IndexRewrite.disable(s, idx.location)
    }),

    "q73_composite_index" -> ((s, dir) => {
      // COMPOSITE secondary index (lead + trailing payload columns): a
      // conjunction `c_name IN (…) AND c_mktsegment = '…'` over two
      // non-key columns serves through ONE index — the lead (c_name)
      // probe prunes index hash buckets, the trailing equality pushes
      // into the probe (zone maps + exact evaluation on the pruned index
      // rows), and only the keys satisfying BOTH read the base. The
      // refresh case exercised here is the composite-specific one: a
      // TRAILING-only value change (the index KEY is unchanged — the
      // upsert rewrites the payload in place, no tombstone needed).
      import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
      val raw = Tables.raw(s, dir, "customer")
      val t = GraftTable.create(s, tmpLoc("graft-q73b-"), "customer_q73",
        raw.schema, Seq("c_custkey"),
        Seq(HashComponent(Seq("c_custkey"), 4)), data = Some(raw))
      val idx = graft.tools.SecondaryIndex.build(s, t,
        Seq("c_name", "c_mktsegment"), tmpLoc("graft-q73i-"), buckets = 16)
      try {
        def servedSubset(df: DataFrame): Boolean = {
          val baseFiles = t.meta.baseFiles.map(f =>
            new org.apache.hadoop.fs.Path(f.path).toUri.getPath).toSet
          val read = df.queryExecution.optimizedPlan.collect {
            case lr: LogicalRelation => lr.relation match {
              case fs: HadoopFsRelation =>
                fs.location.rootPaths.map(_.toUri.getPath)
                  .filter(baseFiles.contains)
              case _ => Nil
            }
          }.flatten.toSet
          read.nonEmpty && read.size < baseFiles.size
        }
        // lead-only serving first (the trailing column is payload, so a
        // lead probe is complete — no composite-prefix soundness hazard)
        if (!servedSubset(t.scan().filter(col("c_name") === "Customer#000000025")))
          throw new IllegalStateException(
            "a composite index must serve lead-only predicates")
        // lead+trailing conjunction with a data-true trailing value (the
        // matched-key set must be non-empty for the subset assert; the
        // actual value is data-dependent, read once — gate scripting only)
        val seg21 = t.scan().filter(col("c_custkey") === 21)
          .select("c_mktsegment").head().getString(0)
        if (!servedSubset(t.scan().filter(
          col("c_name").isin("Customer#000000020", "Customer#000000021",
            "Customer#000000022") && col("c_mktsegment") === seg21)))
          throw new IllegalStateException(
            "a composite index must serve lead+trailing conjunctions")
        def q = t.scan().filter(
          col("c_name").isin("Customer#000000020", "Customer#000000021",
            "Customer#000000022") && col("c_mktsegment") === "GRAFTSEG")
        // trailing-ONLY value change: same index key, payload update
        withShufflePartitions(s, 4) {
          t.upsert(t.scan().filter(col("c_custkey") === 20)
            .withColumn("c_mktsegment", lit("GRAFTSEG")))
        }
        if (servedSubset(q))
          throw new IllegalStateException("a STALE composite index must never serve")
        if (!graft.tools.SecondaryIndex.refresh(s, idx))
          throw new IllegalStateException("refresh must apply the mutation")
        val f = new java.io.File(t.location)
        s.conf.set("spark.sql.catalog.gq73",
          classOf[graft.sources.v2.GraftCatalog].getName)
        s.conf.set("spark.sql.catalog.gq73.warehouse", f.getParent)
        val v2 = s.table(s"gq73.`${f.getName}`").filter(
          col("c_name").isin("Customer#000000020", "Customer#000000021",
            "Customer#000000022") && col("c_mktsegment") === "GRAFTSEG")
        if (!servedSubset(v2))
          throw new IllegalStateException(
            "a refreshed composite index must serve the V2 path")
        withShufflePartitions(s, 4) { materialized(s, v2) }
          .orderBy("c_custkey")
      } finally graft.plans.IndexRewrite.disable(s, idx.location)
    }),

    "q74_index_topn" -> ((s, dir) => {
      // TOP-K served through the secondary index (IndexRewrite on
      // GlobalLimit/LocalLimit/Sort): `ORDER BY c_name DESC LIMIT 3` on an
      // indexed NON-key column reads the 3 extreme entries off the index
      // and point-fetches their base rows — at 100 TB a corpus sort
      // becomes an index read plus a 3-row fetch, the non-key analog of
      // the engine's zone TOP-N cut (S9/q52). Same in-query asserts as
      // q71/q72: fresh serves (strict subset of base files read), stale
      // NEVER serves, a refresh restores serving through the V2 path.
      import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
      val raw = Tables.raw(s, dir, "customer")
      val t = GraftTable.create(s, tmpLoc("graft-q74b-"), "customer_q74",
        raw.schema, Seq("c_custkey"),
        Seq(HashComponent(Seq("c_custkey"), 4)), data = Some(raw))
      val idx = graft.tools.SecondaryIndex.build(s, t, "c_name",
        tmpLoc("graft-q74i-"), buckets = 16)
      try {
        def servedSubset(df: DataFrame): Boolean = {
          val baseFiles = t.meta.baseFiles.map(f =>
            new org.apache.hadoop.fs.Path(f.path).toUri.getPath).toSet
          val read = df.queryExecution.optimizedPlan.collect {
            case lr: LogicalRelation => lr.relation match {
              case fs: HadoopFsRelation =>
                fs.location.rootPaths.map(_.toUri.getPath)
                  .filter(baseFiles.contains)
              case _ => Nil
            }
          }.flatten.toSet
          read.nonEmpty && read.size < baseFiles.size
        }
        def q1 = t.scan().orderBy(col("c_name").desc).limit(3)
        if (!servedSubset(q1))
          throw new IllegalStateException(
            "a fresh index must serve ORDER BY .. LIMIT k through a pruned read")
        // rename the TOP row (max name == max custkey for fixed-width
        // TPC-H names) out of the ordering — SF-agnostic
        val maxKey = t.scan().agg(max(col("c_custkey"))).head().getLong(0)
        withShufflePartitions(s, 4) {
          t.upsert(t.scan().filter(col("c_custkey") === maxKey)
            .withColumn("c_name", lit("AAA#RENAMED")))
        }
        if (servedSubset(q1))
          throw new IllegalStateException("a STALE index must never serve a top-k")
        if (!graft.tools.SecondaryIndex.refresh(s, idx))
          throw new IllegalStateException("refresh must apply the mutation")
        val f = new java.io.File(t.location)
        s.conf.set("spark.sql.catalog.gq74",
          classOf[graft.sources.v2.GraftCatalog].getName)
        s.conf.set("spark.sql.catalog.gq74.warehouse", f.getParent)
        val v2 = s.table(s"gq74.`${f.getName}`")
          .orderBy(col("c_name").desc).limit(3)
        if (!servedSubset(v2))
          throw new IllegalStateException(
            "a refreshed index must serve the top-k on the V2 path of a dirty base")
        withShufflePartitions(s, 4) { materialized(s, v2) }
          .orderBy(col("c_name").desc)
      } finally graft.plans.IndexRewrite.disable(s, idx.location)
    }),

    "q75_functional_index" -> ((s, dir) => {
      // FUNCTIONAL secondary index (SecondaryIndex.buildExpression): the
      // indexed value is an EXPRESSION over source columns — here
      // lower(c_name), the canonical case-insensitive-lookup shape — and
      // a plain `WHERE lower(c_name) = '…'` serves through the index with
      // no explicit call: the predicate's key canonicalizes to the
      // persisted expression, the probe prunes the computed-value hash
      // buckets, the matched keys read the base through PK pruning. The
      // reference has no functional-index analog at all; at 100 TB a
      // case-folded lookup is otherwise a corpus scan with expression
      // evaluation. Refresh re-derives mutated keys through the same
      // expression (in-query asserts: fresh serves via a strict-subset
      // read, stale never serves, the refreshed index serves the V2 path).
      import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
      val raw = Tables.raw(s, dir, "customer")
      val t = GraftTable.create(s, tmpLoc("graft-q75b-"), "customer_q75",
        raw.schema, Seq("c_custkey"),
        Seq(HashComponent(Seq("c_custkey"), 4)), data = Some(raw))
      val idx = graft.tools.SecondaryIndex.buildExpression(s, t,
        "lower(c_name)", tmpLoc("graft-q75i-"), buckets = 16)
      try {
        def servedSubset(df: DataFrame): Boolean = {
          val baseFiles = t.meta.baseFiles.map(f =>
            new org.apache.hadoop.fs.Path(f.path).toUri.getPath).toSet
          val read = df.queryExecution.optimizedPlan.collect {
            case lr: LogicalRelation => lr.relation match {
              case fs: HadoopFsRelation =>
                fs.location.rootPaths.map(_.toUri.getPath)
                  .filter(baseFiles.contains)
              case _ => Nil
            }
          }.flatten.toSet
          read.nonEmpty && read.size < baseFiles.size
        }
        def q1 = t.scan().filter(lower(col("c_name")) === "customer#000000033")
        if (!servedSubset(q1))
          throw new IllegalStateException(
            "a fresh functional index must serve its expression predicate")
        withShufflePartitions(s, 4) {
          t.upsert(t.scan().filter(col("c_custkey") === 33)
            .withColumn("c_name", lit("MIXEDcase#000000033")))
        }
        if (servedSubset(q1))
          throw new IllegalStateException("a STALE functional index must never serve")
        if (!graft.tools.SecondaryIndex.refresh(s, idx))
          throw new IllegalStateException("refresh must apply the mutation")
        val f = new java.io.File(t.location)
        s.conf.set("spark.sql.catalog.gq75",
          classOf[graft.sources.v2.GraftCatalog].getName)
        s.conf.set("spark.sql.catalog.gq75.warehouse", f.getParent)
        val v2 = s.table(s"gq75.`${f.getName}`").filter(
          lower(col("c_name")).isin("mixedcase#000000033",
            "customer#000000033", "customer#000000044"))
        if (!servedSubset(v2))
          throw new IllegalStateException(
            "a refreshed functional index must serve the V2 path")
        withShufflePartitions(s, 4) { materialized(s, v2) }
          .orderBy("c_custkey")
      } finally graft.plans.IndexRewrite.disable(s, idx.location)
    }),

    "q76_covering_index" -> ((s, dir) => {
      // INDEX-ONLY (covering) serving: when the query's output is covered
      // by the index's own columns — above all `count(*)` / grouped
      // aggregates under a served predicate — the plan answers from ONE
      // bucket-pruned index read with ZERO base files anywhere in it.
      // This is the reference's count-only scan posture
      // (docs/whitepaper/kudu.tex:979-983, S10) extended to NON-key
      // predicates: at 100 TB a dashboard count over an indexed column
      // goes from keys-probe + PK-pruned base fan-out to one index read.
      // In-query asserts: (1) the fresh index covers the count — no base
      // relation in the plan, index files read; (2) the instant the base
      // mutates, covering declines; (3) after an incremental refresh the
      // V2 path covers again on the still-dirty base (the covering read
      // never touches the base, so MOR state is irrelevant to it).
      import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
      val raw = Tables.raw(s, dir, "customer")
      val t = GraftTable.create(s, tmpLoc("graft-q76b-"), "customer_q76",
        raw.schema, Seq("c_custkey"),
        Seq(HashComponent(Seq("c_custkey"), 4)), data = Some(raw))
      val idx = graft.tools.SecondaryIndex.build(s, t,
        Seq("c_mktsegment", "c_nationkey"), tmpLoc("graft-q76i-"),
        buckets = 8)
      try {
        def readFrom(df: DataFrame, files: Set[String]): Set[String] =
          graft.plans.ScanRoots.filesRead(df.queryExecution.optimizedPlan, files)
        def filesOf(tbl: GraftTable): Set[String] = tbl.meta.baseFiles
          .map(f => new org.apache.hadoop.fs.Path(f.path).toUri.getPath).toSet
        def covering(df: DataFrame): Boolean =
          readFrom(df, filesOf(t)).isEmpty && readFrom(df, filesOf(idx)).nonEmpty
        def qCount = t.scan().filter(col("c_mktsegment") === "BUILDING")
          .agg(count(lit(1)).as("n"))
        if (!covering(qCount))
          throw new IllegalStateException("a fresh index must cover " +
            s"count(*):\n${qCount.queryExecution.optimizedPlan}")
        withShufflePartitions(s, 4) {
          t.upsert(t.scan().filter(col("c_custkey") === 5)
            .withColumn("c_mktsegment", lit("GRAFTSEG")))
        }
        if (covering(qCount))
          throw new IllegalStateException("a STALE index must never cover")
        if (!graft.tools.SecondaryIndex.refresh(s, idx))
          throw new IllegalStateException("refresh must apply the mutation")
        val f = new java.io.File(t.location)
        s.conf.set("spark.sql.catalog.gq76",
          classOf[graft.sources.v2.GraftCatalog].getName)
        s.conf.set("spark.sql.catalog.gq76.warehouse", f.getParent)
        val v2 = s.table(s"gq76.`${f.getName}`")
          .filter(col("c_mktsegment").isin("BUILDING", "GRAFTSEG"))
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n"), sum("c_nationkey").as("sum_nat"))
        if (!covering(v2))
          throw new IllegalStateException("a refreshed index must cover " +
            s"the V2 grouped count on a dirty base:\n${v2.queryExecution.optimizedPlan}")
        withShufflePartitions(s, 4) { materialized(s, v2) }
          .orderBy("c_mktsegment")
      } finally graft.plans.IndexRewrite.disable(s, idx.location)
    }),

    "q77_date_index" -> ((s, dir) => {
      // DATE-FAMILY functional index: year(<date col>) is deterministic
      // and timezone-free (a date has no instant), so it joins the
      // functional-index expression language — `WHERE year(o_odate) =
      // 1995`, the most common derived predicate on time-ish columns,
      // serves through the index instead of a corpus scan with expression
      // evaluation. year over a TIMESTAMP stays REFUSED (session-timezone
      // read — never sound to serve), which is why this gate derives a
      // DATE column up front. In-query asserts: fresh point predicate
      // COVERS a count (zero base files), stale declines after a date
      // mutation, and after the refresh the V2 path covers the IN and
      // RANGE shapes on the dirty base.
      import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
      val raw = Tables.raw(s, dir, "orders")
        .select(col("o_orderkey"), to_date(col("o_orderdate")).as("o_odate"))
      val t = GraftTable.create(s, tmpLoc("graft-q77b-"), "orders_q77",
        raw.schema, Seq("o_orderkey"),
        Seq(HashComponent(Seq("o_orderkey"), 4)), data = Some(raw))
      val idx = graft.tools.SecondaryIndex.buildExpression(s, t,
        "year(o_odate)", tmpLoc("graft-q77i-"), buckets = 8)
      try {
        def readFrom(df: DataFrame, files: Set[String]): Set[String] =
          graft.plans.ScanRoots.filesRead(df.queryExecution.optimizedPlan, files)
        def filesOf(tbl: GraftTable): Set[String] = tbl.meta.baseFiles
          .map(f => new org.apache.hadoop.fs.Path(f.path).toUri.getPath).toSet
        def covering(df: DataFrame): Boolean =
          readFrom(df, filesOf(t)).isEmpty && readFrom(df, filesOf(idx)).nonEmpty
        def qPoint = t.scan().filter(year(col("o_odate")) === 1995)
          .agg(count(lit(1)).as("n"))
        if (!covering(qPoint))
          throw new IllegalStateException("a fresh year(date) index must " +
            s"cover the point count:\n${qPoint.queryExecution.optimizedPlan}")
        withShufflePartitions(s, 4) {
          t.upsert(t.scan().filter(col("o_orderkey") === 7)
            .withColumn("o_odate", lit(java.sql.Date.valueOf("2032-01-01"))))
        }
        if (covering(qPoint))
          throw new IllegalStateException("a STALE index must never cover")
        if (!graft.tools.SecondaryIndex.refresh(s, idx))
          throw new IllegalStateException("refresh must apply the mutation")
        val f = new java.io.File(t.location)
        s.conf.set("spark.sql.catalog.gq77",
          classOf[graft.sources.v2.GraftCatalog].getName)
        s.conf.set("spark.sql.catalog.gq77.warehouse", f.getParent)
        val v2 = s.table(s"gq77.`${f.getName}`")
        val qIn = v2.filter(year(col("o_odate")).isin(1998, 2032))
          .agg(count(lit(1)).as("n")).withColumn("tag", lit("in"))
        val qRange = v2.filter(year(col("o_odate")) >= 1998)
          .agg(count(lit(1)).as("n")).withColumn("tag", lit("range"))
        if (!covering(qIn) || !covering(qRange))
          throw new IllegalStateException("a refreshed year(date) index " +
            "must cover IN and RANGE through V2 on a dirty base:\n" +
            qIn.queryExecution.optimizedPlan + "\n" +
            qRange.queryExecution.optimizedPlan)
        withShufflePartitions(s, 4) {
          materialized(s, qIn.union(qRange).select("tag", "n"))
        }.orderBy("tag")
      } finally graft.plans.IndexRewrite.disable(s, idx.location)
    }),

    "q78_clustered_range" -> ((s, dir) => {
      // CLUSTERED-BUILD range serving: build(clustered = true) leaves the
      // index in lead-mode value slabs with NO manual cluster() call —
      // the layout every range probe wants (a hash layout spans the full
      // value domain per file; a BETWEEN then scans the whole bounded
      // index). In-query asserts: (1) the slab layout persisted
      // (clusterBy + ≥ 8 files/bucket); (2) an assertPrune'd BETWEEN
      // probe opens ≤ HALF the index files — the contract a hash layout
      // cannot meet; (3) the transparent IndexRewrite interval serve
      // reads a strict subset of base files, stale declines after a
      // mutation, and the refreshed index serves the V2 path on the
      // dirty base. Rows hash-gate against the oracle's direct filter.
      import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
      val raw = Tables.raw(s, dir, "customer")
      val t = GraftTable.create(s, tmpLoc("graft-q78b-"), "customer_q78",
        raw.schema, Seq("c_custkey"),
        Seq(HashComponent(Seq("c_custkey"), 4)), data = Some(raw))
      // c_nationkey: LONG (zClusterable — a double lead like c_acctbal
      // refuses clustering: parquet min/max are undefined under NaN)
      val idx = graft.tools.SecondaryIndex.build(s, t, Seq("c_nationkey"),
        tmpLoc("graft-q78i-"), buckets = 4, clustered = true)
      try {
        if (idx.meta.clusterBy.isEmpty)
          throw new IllegalStateException("clustered build must persist the spec")
        // the assertPrune contract: a narrow BETWEEN opens ≤ half the
        // index files under the slab layout — no manual cluster() ran
        graft.tools.SecondaryIndex.lookupWhere(s, idx,
          Seq(org.apache.spark.sql.sources.GreaterThanOrEqual("c_nationkey", 5L),
            org.apache.spark.sql.sources.LessThanOrEqual("c_nationkey", 7L)),
          col("c_nationkey") >= 5L && col("c_nationkey") <= 7L,
          assertPrune = true).collect()
        // the interval matches ~180 keys — every PK bucket, so a strict-
        // subset fetch assert cannot discriminate; the COVERING serve can:
        // a covered projection under the interval reads ZERO base files
        def readFrom(df: DataFrame, files: Set[String]): Set[String] =
          graft.plans.ScanRoots.filesRead(df.queryExecution.optimizedPlan, files)
        def filesOf(tbl: GraftTable): Set[String] = tbl.meta.baseFiles
          .map(f => new org.apache.hadoop.fs.Path(f.path).toUri.getPath).toSet
        def covering(df: DataFrame): Boolean =
          readFrom(df, filesOf(t)).isEmpty && readFrom(df, filesOf(idx)).nonEmpty
        def q1 = t.scan()
          .filter(col("c_nationkey") >= 5L && col("c_nationkey") <= 7L)
          .select("c_custkey", "c_nationkey")
        if (!covering(q1))
          throw new IllegalStateException("a fresh clustered index must " +
            s"cover the BETWEEN projection:\n${q1.queryExecution.optimizedPlan}")
        withShufflePartitions(s, 4) {
          t.upsert(t.scan().filter(col("c_custkey") === 11)
            .withColumn("c_nationkey", lit(6L)))
        }
        if (covering(q1))
          throw new IllegalStateException("a STALE index must never serve")
        if (!graft.tools.SecondaryIndex.refresh(s, idx))
          throw new IllegalStateException("refresh must apply the mutation")
        val f = new java.io.File(t.location)
        s.conf.set("spark.sql.catalog.gq78",
          classOf[graft.sources.v2.GraftCatalog].getName)
        s.conf.set("spark.sql.catalog.gq78.warehouse", f.getParent)
        val v2 = s.table(s"gq78.`${f.getName}`")
          .filter(col("c_nationkey") >= 5L && col("c_nationkey") <= 7L)
          .select("c_custkey", "c_nationkey")
        if (!covering(v2))
          throw new IllegalStateException(
            "a refreshed clustered index must cover the V2 path")
        withShufflePartitions(s, 4) { materialized(s, v2) }
          .orderBy("c_custkey")
      } finally graft.plans.IndexRewrite.disable(s, idx.location)
    }),

    "q79_index_union" -> ((s, dir) => {
      // INDEX UNION (OR serving): `WHERE a = x OR b = y` with an index on
      // `a` and a DIFFERENT index on `b` — unservable by any single-probe
      // rewrite — probes each disjunct's index, unions the bounded key
      // sets, and fetches the base ONCE through PK pruning
      // (IndexRewrite.tryUnionRewrite + SecondaryIndex.lookupUnionWhere).
      // At 100 TB an OR across two indexed columns is the classic
      // dashboard shape that silently degrades to a corpus scan; here it
      // is two point reads. In-query asserts pin the contract: (1) the
      // fresh union serves (strict subset of base files read); (2) with
      // one index disarmed the OR has an uncovered disjunct and the whole
      // union declines — a half-covered OR must never serve; (3) a base
      // mutation declines BOTH-stale and HALF-refreshed states (every
      // involved index's watermark must equal the matched base version);
      // (4) both refreshed, the union serves the V2 path on the dirty
      // base. The emitted rows hash-gate against the oracle's direct OR
      // filter over the mutated base, with the renamed row serving under
      // its NEW name through the union.
      val raw = Tables.raw(s, dir, "customer")
      val t = GraftTable.create(s, tmpLoc("graft-q79b-"), "customer_q79",
        raw.schema, Seq("c_custkey"),
        Seq(HashComponent(Seq("c_custkey"), 4)), data = Some(raw))
      val ia = graft.tools.SecondaryIndex.build(s, t, "c_name",
        tmpLoc("graft-q79i-"), buckets = 16)
      val ib = graft.tools.SecondaryIndex.build(s, t, "c_acctbal",
        tmpLoc("graft-q79j-"), buckets = 16)
      try {
        def servedSubset(df: DataFrame): Boolean = {
          val baseFiles = t.meta.baseFiles.map(f =>
            new org.apache.hadoop.fs.Path(f.path).toUri.getPath).toSet
          val read = graft.plans.ScanRoots.filesRead(
            df.queryExecution.optimizedPlan, baseFiles)
          read.nonEmpty && read.size < baseFiles.size
        }
        // the OTHER index's probe value comes off the data (c_acctbal is
        // generated, never stable across SFs); the oracle derives the
        // same literal with a scalar subquery. TWO matched keys over 4
        // PK buckets keep the strict-subset assert deterministic.
        val bal42 = t.scan().filter(col("c_custkey") === 42)
          .select("c_acctbal").collect().head.getDouble(0)
        def q1 = t.scan().filter(
          col("c_name") === "Customer#000000007" || col("c_acctbal") === bal42)
        if (!servedSubset(q1))
          throw new IllegalStateException("a fresh index pair must serve " +
            s"the OR as a union:\n${q1.queryExecution.optimizedPlan}")
        graft.plans.IndexRewrite.disable(s, ib.location)
        if (servedSubset(q1))
          throw new IllegalStateException(
            "an OR with an uncovered disjunct must keep the scan")
        graft.plans.IndexRewrite.enable(s, ib)
        withShufflePartitions(s, 4) {
          t.upsert(t.scan().filter(col("c_custkey") === 7)
            .withColumn("c_name", lit("RENAMED#000000007")))
        }
        if (servedSubset(q1))
          throw new IllegalStateException("STALE indexes must never serve")
        if (!graft.tools.SecondaryIndex.refresh(s, ia))
          throw new IllegalStateException("refresh must apply the mutation")
        if (servedSubset(q1))
          throw new IllegalStateException(
            "a HALF-refreshed union must decline whole")
        if (!graft.tools.SecondaryIndex.refresh(s, ib))
          throw new IllegalStateException("refresh must advance the watermark")
        val f = new java.io.File(t.location)
        s.conf.set("spark.sql.catalog.gq79",
          classOf[graft.sources.v2.GraftCatalog].getName)
        s.conf.set("spark.sql.catalog.gq79.warehouse", f.getParent)
        val v2 = s.table(s"gq79.`${f.getName}`").filter(
          col("c_name") === "RENAMED#000000007" || col("c_acctbal") === bal42)
        if (!servedSubset(v2))
          throw new IllegalStateException("refreshed indexes must serve " +
            s"the union on the dirty base via V2:\n${v2.queryExecution.optimizedPlan}")
        withShufflePartitions(s, 4) { materialized(s, v2) }
          .orderBy("c_custkey")
      } finally {
        graft.plans.IndexRewrite.disable(s, ia.location)
        graft.plans.IndexRewrite.disable(s, ib.location)
      }
    }),

    "q80_filtered_topk" -> ((s, dir) => {
      // FILTERED top-k through the index: `WHERE c_mktsegment = '…'
      // ORDER BY c_name DESC LIMIT 3` — the per-group leaderboard shape —
      // served from a composite index (c_name, c_mktsegment): the
      // TRAILING column evaluates the predicate ON the index entries, the
      // lead orders them, and exactly three matched keys fetch through PK
      // pruning (IndexRewrite filtered top-k + SecondaryIndex.topK where).
      // At 100 TB this turns a filtered corpus sort into one bounded
      // index read plus a 3-row point fetch. In-query asserts: (1) fresh
      // serves (strict subset of base files read — 3 keys < 4 PK
      // buckets); (2) the segment's top name renamed OUT declines the
      // stale index; (3) the refreshed index serves the V2 path on the
      // dirty base, and the NEW top-3 excludes the renamed row. Hash-
      // gated against the oracle's direct filter+sort over the mutated
      // base (unique names make the top-3 set deterministic).
      val raw = Tables.raw(s, dir, "customer")
      val t = GraftTable.create(s, tmpLoc("graft-q80b-"), "customer_q80",
        raw.schema, Seq("c_custkey"),
        Seq(HashComponent(Seq("c_custkey"), 4)), data = Some(raw))
      val idx = graft.tools.SecondaryIndex.build(s, t,
        Seq("c_name", "c_mktsegment"), tmpLoc("graft-q80i-"), buckets = 16)
      try {
        def servedSubset(df: DataFrame): Boolean = {
          val baseFiles = t.meta.baseFiles.map(f =>
            new org.apache.hadoop.fs.Path(f.path).toUri.getPath).toSet
          val read = graft.plans.ScanRoots.filesRead(
            df.queryExecution.optimizedPlan, baseFiles)
          read.nonEmpty && read.size < baseFiles.size
        }
        def leaderboard(base: DataFrame) = base
          .filter(col("c_mktsegment") === "BUILDING")
          .orderBy(col("c_name").desc).limit(3)
        def q1 = leaderboard(t.scan())
        if (!servedSubset(q1))
          throw new IllegalStateException("a fresh composite index must " +
            s"serve the filtered top-k:\n${q1.queryExecution.optimizedPlan}")
        // the segment's current top name, read through the serve itself
        val topKey = q1.select("c_custkey").collect().head.getLong(0)
        withShufflePartitions(s, 4) {
          t.upsert(t.scan().filter(col("c_custkey") === topKey)
            .withColumn("c_name", lit("AAA#RENAMED")))
        }
        if (servedSubset(q1))
          throw new IllegalStateException("a STALE index must never serve")
        if (!graft.tools.SecondaryIndex.refresh(s, idx))
          throw new IllegalStateException("refresh must apply the mutation")
        val f = new java.io.File(t.location)
        s.conf.set("spark.sql.catalog.gq80",
          classOf[graft.sources.v2.GraftCatalog].getName)
        s.conf.set("spark.sql.catalog.gq80.warehouse", f.getParent)
        val v2 = leaderboard(s.table(s"gq80.`${f.getName}`"))
        if (!servedSubset(v2))
          throw new IllegalStateException("a refreshed index must serve " +
            s"the filtered top-k via V2 on the dirty base:\n${v2.queryExecution.optimizedPlan}")
        withShufflePartitions(s, 4) { materialized(s, v2) }
          .orderBy("c_custkey")
      } finally graft.plans.IndexRewrite.disable(s, idx.location)
    }),

    "q81_index_join" -> ((s, dir) => {
      // INDEX JOIN (DPP through the secondary index): `fact JOIN tiny_dim
      // ON fact.c_name = dim.k` — the dim side is broadcast-small, its
      // DISTINCT join keys collect at plan time (the dynamic-partition-
      // pruning posture, bounded by rewriteMaxKeys), the index probes
      // them, and the fact side reads ONLY the matched keys' tablets; the
      // Join node and its full condition stay above, so exactness is the
      // equality's own (a dropped fact row's key is outside the dim key
      // set — it could never join). At 100 TB this is the difference
      // between a corpus scan and |dim| point reads for every enrichment
      // join on a non-key column, which the fact's PARTITIONING cannot
      // prune. In-query asserts: fresh serves (strict subset of base
      // files read), a base mutation declines, the refreshed index
      // serves the V2 path on the dirty base — where the renamed
      // customer joins under its NEW name.
      import s.implicits._
      val raw = Tables.raw(s, dir, "customer")
      val t = GraftTable.create(s, tmpLoc("graft-q81b-"), "customer_q81",
        raw.schema, Seq("c_custkey"),
        Seq(HashComponent(Seq("c_custkey"), 4)), data = Some(raw))
      val idx = graft.tools.SecondaryIndex.build(s, t, "c_name",
        tmpLoc("graft-q81i-"), buckets = 16)
      try {
        def servedSubset(df: DataFrame): Boolean = {
          val baseFiles = t.meta.baseFiles.map(f =>
            new org.apache.hadoop.fs.Path(f.path).toUri.getPath).toSet
          val read = graft.plans.ScanRoots.filesRead(
            df.queryExecution.optimizedPlan, baseFiles)
          read.nonEmpty && read.size < baseFiles.size
        }
        val dim = Seq(("RENAMED#000000007", "A"),
          ("Customer#000000042", "B"), ("nope", "C")).toDF("k", "tag")
        def joined(base: DataFrame) = base
          .join(dim, col("c_name") === col("k"))
          .select(col("c_custkey"), col("c_name"), col("tag"))
        def q1 = joined(t.scan())
        if (!servedSubset(q1))
          throw new IllegalStateException("a fresh index must serve the " +
            s"join probe:\n${q1.queryExecution.optimizedPlan}")
        withShufflePartitions(s, 4) {
          t.upsert(t.scan().filter(col("c_custkey") === 7)
            .withColumn("c_name", lit("RENAMED#000000007")))
        }
        if (servedSubset(q1))
          throw new IllegalStateException("a STALE index must never serve")
        if (!graft.tools.SecondaryIndex.refresh(s, idx))
          throw new IllegalStateException("refresh must apply the mutation")
        val f = new java.io.File(t.location)
        s.conf.set("spark.sql.catalog.gq81",
          classOf[graft.sources.v2.GraftCatalog].getName)
        s.conf.set("spark.sql.catalog.gq81.warehouse", f.getParent)
        val v2 = joined(s.table(s"gq81.`${f.getName}`"))
        if (!servedSubset(v2))
          throw new IllegalStateException("a refreshed index must serve " +
            s"the join via V2 on the dirty base:\n${v2.queryExecution.optimizedPlan}")
        withShufflePartitions(s, 4) { materialized(s, v2) }
          .orderBy("c_custkey")
      } finally graft.plans.IndexRewrite.disable(s, idx.location)
    }),

    "q70_mv_rewrite" -> ((s, dir) => {
      // Materialized-view QUERY REWRITE (RollupRewrite): a GROUP BY over
      // the base is answered from the maintained rollup — at 100 TB this
      // turns every dashboard refresh from a full-corpus shuffle into a
      // groups-sized read. In-query asserts pin the contract: (1) a fresh
      // rollup serves BOTH scan shapes (the DSv1 clean-snapshot file scan
      // and the V2 catalog relation); (2) the instant the base mutates the
      // rewrite declines — a stale rollup NEVER serves; (3) after an
      // incremental refresh the V2 path serves again even though the base
      // is still delta-dirty (the rewrite fires on the catalog relation
      // before merge-on-read planning). The gated rows are the
      // rollup-served aggregate, hash-matched against the oracle's
      // from-scratch recompute of the mutated base.
      import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
      val wh = q70Wh.computeIfAbsent(dir, _ => tmpLoc("graft-q70-wh-"))
      s.conf.set("spark.sql.catalog.gq70",
        classOf[graft.sources.v2.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gq70.warehouse", wh)
      val name = s"ord${System.nanoTime()}"
      val raw = Tables.raw(s, dir, "orders")
      val t = GraftTable.create(s, s"$wh/$name", name,
        raw.schema, Seq("o_orderpriority", "o_orderkey"),
        Seq(HashComponent(Seq("o_orderkey"), 2)), data = Some(raw))
      val rollup = graft.tools.MaterializedRollup.build(s, t,
        Seq("o_orderpriority"), Seq(
          "n_rows" -> "count(*)",
          "sum_price" -> "sum(CAST(o_totalprice AS DECIMAL(28,2)))",
          "max_key" -> "max(o_orderkey)"),
        tmpLoc("graft-q70r-"), buckets = 4)
      graft.plans.RollupRewrite.enable(s, rollup)
      try {
        def agg(base: DataFrame) = base.groupBy("o_orderpriority").agg(
          count(lit(1)).as("n_rows"),
          sum(expr("CAST(o_totalprice AS DECIMAL(28,2))")).as("sum_price"),
          max("o_orderkey").as("max_key"))
        def served(df: DataFrame): Boolean =
          df.queryExecution.optimizedPlan.collect {
            case lr: LogicalRelation => lr.relation match {
              case fs: HadoopFsRelation =>
                fs.location.rootPaths.map(_.toUri.getPath)
              case _ => Nil
            }
          }.flatten.exists(_.startsWith(rollup.location))
        def v2 = agg(s.table(s"gq70.`$name`"))
        if (!served(agg(t.scan())))
          throw new IllegalStateException(
            "fresh rollup must serve the DSv1 clean-snapshot aggregate")
        if (!served(v2))
          throw new IllegalStateException(
            "fresh rollup must serve the V2 catalog aggregate")
        withShufflePartitions(s, 4) {
          t.upsert(t.scan()
            .filter(col("o_orderpriority") === "1-URGENT" &&
              col("o_orderkey") % 7 === 0)
            .withColumn("o_totalprice", col("o_totalprice") * 2))
        }
        if (served(v2))
          throw new IllegalStateException("a STALE rollup must never serve")
        if (!graft.tools.MaterializedRollup.refresh(s, rollup))
          throw new IllegalStateException("refresh must apply the mutation")
        val q = v2
        if (!served(q))
          throw new IllegalStateException(
            "a refreshed rollup must serve the V2 path on a dirty base")
        // the SUBSET path, driver-gated too: the GLOBAL aggregate must
        // RE-AGGREGATE the rollup (count folds as sum-of-group-counts)
        // and its row rides the same oracle as a '__ALL__' sentinel group
        def vg = s.table(s"gq70.`$name`").agg(
          count(lit(1)).as("n_rows"),
          sum(expr("CAST(o_totalprice AS DECIMAL(28,2))")).as("sum_price"),
          max("o_orderkey").as("max_key"))
        if (!served(vg))
          throw new IllegalStateException(
            "the global aggregate must re-aggregate the rollup")
        withShufflePartitions(s, 4) {
          materialized(s, // materialize WHILE the rewrite serves
            q.unionByName(vg.select(lit("__ALL__").as("o_orderpriority"),
              col("n_rows"), col("sum_price"), col("max_key"))))
        } // house rule (see q21): gate money as round(CAST(d), 2), applied
          // AFTER the checkpoint so the served aggregate stays rewrite-shaped
          .withColumn("sum_price", round(col("sum_price").cast("double"), 2))
          .orderBy("o_orderpriority")
      } finally graft.plans.RollupRewrite.disable(s, rollup.location)
    }),

    "q83_sql_index" -> ((s, dir) => {
      // SQL index DDL (DSv2 SupportsIndex): CREATE INDEX builds the
      // maintained secondary index and arms the serving session in one
      // statement — no API call anywhere — and DROP INDEX disarms it.
      // The gate creates the engine table, indexes c_name through SQL,
      // asserts the point predicate serves through the V2 relation
      // (strict subset of base files read), drops the index through SQL
      // and asserts the SAME query keeps the scan, then re-creates the
      // index with OPTIONS and hash-gates the served rows against the
      // oracle's direct filter.
      val raw = Tables.raw(s, dir, "customer")
      val wh = tmpLoc("graft-q83-wh-")
      val name = s"cust${System.nanoTime()}"
      val t = GraftTable.create(s, s"$wh/$name", name,
        raw.schema, Seq("c_custkey"),
        Seq(HashComponent(Seq("c_custkey"), 4)), data = Some(raw))
      val catName = s"gq83${System.nanoTime() % 1000}"
      s.conf.set(s"spark.sql.catalog.$catName",
        classOf[graft.sources.v2.GraftCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$catName.warehouse", wh)
      val idxLoc = s"$wh/.sidx/${name}_nameidx"
      try {
        def servedSubset(df: DataFrame): Boolean = {
          val baseFiles = t.meta.baseFiles.map(f =>
            new org.apache.hadoop.fs.Path(f.path).toUri.getPath).toSet
          val read = graft.plans.ScanRoots.filesRead(
            df.queryExecution.optimizedPlan, baseFiles)
          read.nonEmpty && read.size < baseFiles.size
        }
        def q = s.table(s"$catName.`$name`").filter(
          col("c_name").isin("Customer#000000019", "Customer#000000036"))
        s.sql(s"CREATE INDEX nameidx ON TABLE $catName.`$name` (c_name)")
        if (!servedSubset(q))
          throw new IllegalStateException("a SQL-created index must serve " +
            s"transparently:\n${q.queryExecution.optimizedPlan}")
        s.sql(s"DROP INDEX nameidx ON TABLE $catName.`$name`")
        if (servedSubset(q))
          throw new IllegalStateException(
            "a SQL-dropped index must stop serving")
        if (graft.catalog.TableMeta.exists(idxLoc))
          throw new IllegalStateException("DROP INDEX must remove the table")
        s.sql(s"CREATE INDEX nameidx ON TABLE $catName.`$name` (c_name) " +
          "OPTIONS (buckets=8)")
        if (!servedSubset(q))
          throw new IllegalStateException("the re-created index must serve")
        withShufflePartitions(s, 4) { materialized(s, q) }
          .orderBy("c_custkey")
      } finally graft.plans.IndexRewrite.disable(s, idxLoc)
    }),

    "q82_mv_avg" -> ((s, dir) => {
      // AVG through the MV rewrite (derived aggregates): avg is never
      // STORED in a rollup — group averages do not re-aggregate — but it
      // DERIVES from sum(x)+count(x), exact: sum/count per group, and
      // sum(sums)/sum(counts) for the global mean. The gate groups
      // orders by priority over a rollup carrying (count(*),
      // sum(o_custkey), count(o_custkey)) and asserts the ladder: fresh
      // serves both scan shapes, a base mutation declines, the refreshed
      // rollup serves the V2 path on the dirty base; the emitted rows are
      // the served per-group averages plus the re-derived '__ALL__'
      // global mean, hash-exact vs DuckDB (integer sums below 2^53 are
      // double-exact, so the division is bitwise identical — no rounding
      // house rule needed).
      import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
      val wh = q82Wh.computeIfAbsent(dir, _ => tmpLoc("graft-q82-wh-"))
      s.conf.set("spark.sql.catalog.gq82",
        classOf[graft.sources.v2.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gq82.warehouse", wh)
      val name = s"orda${System.nanoTime()}"
      val raw = Tables.raw(s, dir, "orders")
      val t = GraftTable.create(s, s"$wh/$name", name,
        raw.schema, Seq("o_orderpriority", "o_orderkey"),
        Seq(HashComponent(Seq("o_orderkey"), 2)), data = Some(raw))
      val rollup = graft.tools.MaterializedRollup.build(s, t,
        Seq("o_orderpriority"), Seq(
          "n" -> "count(*)",
          "sc" -> "sum(o_custkey)",
          "cc" -> "count(o_custkey)"),
        tmpLoc("graft-q82r-"), buckets = 4)
      graft.plans.RollupRewrite.enable(s, rollup)
      try {
        def agg(base: DataFrame) = base.groupBy("o_orderpriority").agg(
          avg("o_custkey").as("avg_cust"),
          count(col("o_custkey")).as("n_cust"))
        def served(df: DataFrame): Boolean =
          df.queryExecution.optimizedPlan.collect {
            case lr: LogicalRelation => lr.relation match {
              case fs: HadoopFsRelation =>
                fs.location.rootPaths.map(_.toUri.getPath)
              case _ => Nil
            }
          }.flatten.exists(_.startsWith(rollup.location))
        def v2 = agg(s.table(s"gq82.`$name`"))
        if (!served(agg(t.scan())))
          throw new IllegalStateException(
            "fresh rollup must derive avg on the DSv1 aggregate")
        if (!served(v2))
          throw new IllegalStateException(
            "fresh rollup must derive avg on the V2 aggregate")
        withShufflePartitions(s, 4) {
          t.upsert(t.scan()
            .filter(col("o_orderpriority") === "1-URGENT" &&
              col("o_orderkey") % 11 === 0)
            .withColumn("o_custkey", col("o_custkey") + lit(1000000L)))
        }
        if (served(v2))
          throw new IllegalStateException("a STALE rollup must never serve")
        if (!graft.tools.MaterializedRollup.refresh(s, rollup))
          throw new IllegalStateException("refresh must apply the mutation")
        if (!served(v2))
          throw new IllegalStateException(
            "a refreshed rollup must derive avg on the dirty base via V2")
        // the global mean re-derives: sum(sums)/sum(counts)
        def vg = s.table(s"gq82.`$name`").agg(
          avg("o_custkey").as("avg_cust"),
          count(col("o_custkey")).as("n_cust"))
        if (!served(vg))
          throw new IllegalStateException(
            "the global avg must re-derive from the rollup")
        withShufflePartitions(s, 4) {
          materialized(s,
            v2.unionByName(vg.select(lit("__ALL__").as("o_orderpriority"),
              col("avg_cust"), col("n_cust"))))
        }.orderBy("o_orderpriority")
      } finally graft.plans.RollupRewrite.disable(s, rollup.location)
    }),

    "q63_stream_join" -> ((s, dir) => {
      // Stream-stream event-time join, END TO END THROUGH THE ENGINE:
      // the one stream feeds from the engine's change-stream source
      // (GraftMicroBatchStream — the q38 path; committed versions are the
      // offsets), self-joins by event-id parity — impressions (even ids)
      // pair with clicks (odd ids) for the same user within 30 minutes,
      // BOTH branches watermarked 15 min — and the joined pairs land
      // through the W8 streaming upsert sink in a second graft table whose
      // merge-on-read scan is the gated result. Spark buffers each side's
      // state and evicts it as the joint watermark passes, which is what
      // makes the join runnable on an unbounded 100 TB stream (state is a
      // sliding window, never the history); the PK upsert sink makes the
      // at-least-once replay idempotent. Cost attribution (ProfileQ63,
      // round 14): each ~1 s trigger spends 0.6-1.1 s in addBatch — the
      // four per-partition state stores plus join execution — ~0.14 s in
      // queryPlanning, and <=1 ms in the engine source's latestOffset/
      // getBatch (version manifests are memoized per stream), so the
      // per-batch floor is Spark state-store overhead, not engine
      // planning. Chronological chunk COMMITS to
      // the source table (one version per chunk) replay in lock-step —
      // nothing is late, so the streamed result equals the batch interval
      // join the oracle computes. Sentinel commits flush the final pairs
      // (2h apart so they never pair with data or each other); they are
      // filtered AFTER the watermark node so eviction still advances.
      import s.implicits._
      val raw = Tables.raw(s, dir, "events")
      val srcLoc = tmpLoc("graft-q63-src-")
      val src = GraftTable.create(s, srcLoc, "ev63", raw.schema,
        Seq("event_id"), Seq(HashComponent(Seq("event_id"), 2)))
      val pairSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("l_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("r_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("user_id",
          org.apache.spark.sql.types.LongType, nullable = true)))
      val sinkT = GraftTable.create(s, tmpLoc("graft-q63-pairs-"), "pairs63",
        pairSchema, Seq("l_id", "r_id"), Seq(HashComponent(Seq("l_id"), 1)))
      val f = new java.io.File(srcLoc)
      s.conf.set("spark.sql.catalog.gq63",
        classOf[graft.sources.v2.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gq63.warehouse", f.getParent)
      val ndKey = "spark.sql.streaming.noDataMicroBatches.enabled"
      val ndPrev = s.conf.get(ndKey)
      s.conf.set(ndKey, "false")
      s.conf.set("graft.delta.writePartitions", "1") // one file per chunk commit
      val ckpt = ckptLoc("graft-q63-ckpt-")
      // stream-stream joins run FOUR state stores per partition per batch;
      // at this key cardinality one partition minimizes the fixed per-batch
      // store overhead that dominates a replay (dev A/B knob: the r16
      // re-measure at 2/4 partitions confirmed 1 still wins — store
      // create+commit overhead beats the 66k-row join's parallelism gain)
      val q63p = sys.props.getOrElse("graft.q63.partitions", "1").toInt
      try withShufflePartitions(s, q63p) {
        val st = s.readStream.option("graft.startingVersion", "1")
          .table(s"gq63.`${f.getName}`")
        val l = st.filter(pmod(col("event_id"), lit(2)) === 0)
          .withWatermark("ts", "15 minutes")
          .filter(col("user_id") >= 0)
          .select(col("event_id").as("l_id"), col("user_id"), col("ts").as("l_ts"))
        val r = st.filter(pmod(col("event_id"), lit(2)) === 1)
          .withWatermark("ts", "15 minutes")
          .filter(col("user_id") >= 0)
          .select(col("event_id").as("r_id"), col("user_id").as("r_user"),
            col("ts").as("r_ts"))
        val q = l.join(r, col("user_id") === col("r_user") &&
            col("r_ts") >= col("l_ts") &&
            col("r_ts") < col("l_ts") + expr("INTERVAL 30 MINUTES"))
          .select(col("l_id"), col("r_id"), col("user_id"))
          .writeStream.format("graft").option("path", sinkT.location)
          .outputMode("append")
          .option("checkpointLocation", ckpt)
          .start()
        try {
          // 3 chronological chunks, each ONE committed source version:
          // enough watermark progression for mid-stream append emission +
          // state eviction; per-batch fixed cost dominates, so the chunk
          // count is the knob. Chunk membership is a ts-range predicate —
          // each chunk upserts as a DISTRIBUTED filter of the raw frame
          // (the old replay sorted 100k rows and round-tripped them
          // through the driver per iteration; boundary exactness is
          // irrelevant as long as the chunks partition the data in time
          // order, which range predicates give by construction)
          val (b1, b2, mx) = q63Bounds(s, dir) // memoized: one job per JVM
          val maxTs = mx / 1000 // micros → sentinel millis
          Seq[Column](
            col("ts").isNull || unix_micros(col("ts")) < b1,
            unix_micros(col("ts")) >= b1 && unix_micros(col("ts")) < b2,
            unix_micros(col("ts")) >= b2
          ).foreach { pred =>
            src.upsert(raw.filter(pred))
            q.processAllAvailable()
          }
          // the source must actually BE the engine stream (this gate
          // validates the engine, not Spark): the progress's source is the
          // change-stream reader
          if (!Option(q.lastProgress).exists(_.sources.exists(
              _.description.contains("GraftMicroBatchStream"))))
            throw new IllegalStateException(
              "q63 must stream from the engine change-stream source")
          // flush: two far-future sentinel commits on BOTH parities (first
          // advances max event time, second applies the new watermark and
          // emits)
          (1 to 2).foreach { i =>
            val ts = new java.sql.Timestamp(maxTs + i * 2 * 3600 * 1000)
            src.upsert(Seq(
              Ev(-2L, ts, -1L, "zz_sentinel", 0.0, null),
              Ev(-1L, ts, -1L, "zz_sentinel", 0.0, null)).toDF())
            q.processAllAvailable()
          }
        } finally q.stop()
      } finally {
        s.conf.set(ndKey, ndPrev)
        s.conf.unset("graft.delta.writePartitions")
        rmrf(ckpt)
      }
      sinkT.scan().orderBy("l_id", "r_id")
    }),

    "q60_table_copy" -> ((s, dir) => {
      // E2 hash-gated (tools/table_scanner.cc:823-1045 `kudu table copy`):
      // the copy must carry the current SNAPSHOT (post-mutation state,
      // merge-on-read resolved into the bulk load) plus the schema, PK and
      // partition layout — and land CLEAN (a copy has no delta history).
      import graft.tools.GraftTools
      val raw = Tables.raw(s, dir, "supplier")
      val src = GraftTable.create(s, tmpLoc("graft-q60-src-"), "supplier_q60",
        raw.schema, Seq("s_suppkey"), Seq(HashComponent(Seq("s_suppkey"), 4)),
        data = Some(raw))
      src.upsert(raw.filter(pmod(col("s_suppkey"), lit(5)) === 0)
        .withColumn("s_acctbal", col("s_acctbal") + 100))
      src.deleteWhere(pmod(col("s_suppkey"), lit(11)) === 0)
      val dest = GraftTools.copyTable(s, src, tmpLoc("graft-q60-dest-"))
      if (dest.meta.hash != src.meta.hash ||
          dest.meta.userKeyCols != src.meta.userKeyCols)
        throw new IllegalStateException("table copy must preserve PK + layout")
      if (dest.meta.deltaFiles.nonEmpty)
        throw new IllegalStateException("a table copy is a clean bulk load")
      dest.scan().orderBy("s_suppkey")
    }),

    "q61_loadgen" -> ((s, dir) => {
      // E4 hash-gated (tools/tool_action_perf.cc loadgen): the generator
      // loads a fresh engine table through the strict-INSERT path and the
      // scan must equal the generator spec exactly (sequential mode is
      // oracle-reproducible; the hash-scrambled random mode is gated
      // in-query for run-to-run determinism — the property loadgen's
      // verify-after-write depends on).
      import graft.tools.GraftTools
      val n = 5000L
      def rndSig() = GraftTools.loadgen(s, n, random = true)
        .agg(sum(crc32(col("payload"))).as("h"), sum(length(col("payload"))).as("l"))
        .collect()(0)
      val (sig1, sig2) = (rndSig(), rndSig())
      if (sig1 != sig2)
        throw new IllegalStateException(
          s"random loadgen must be deterministic: $sig1 vs $sig2")
      val gen = GraftTools.loadgen(s, n)
      val t = GraftTable.create(s, tmpLoc("graft-q61-"), "loadgen_q61",
        gen.schema, Seq("id"), Seq(HashComponent(Seq("id"), 4)))
      t.insert(gen)
      t.scan().orderBy("id")
    }),

    "q62_import_export" -> ((s, dir) => {
      // E5 hash-gated (kudu-spark-tools ImportExportFiles): engine → CSV →
      // engine → ORC → engine → parquet → engine; the final table
      // hash-matches the raw source exactly across all THREE interchange
      // formats the distribution ships (quoted strings and schema-cast
      // reads survive every round trip; imports ride the engine upsert
      // path). Identity roundtrips, so the oracle is unchanged.
      import graft.tools.GraftTools
      val raw = Tables.raw(s, dir, "nation")
      val t = GraftTable.create(s, tmpLoc("graft-q62-src-"), "nation_q62",
        raw.schema, Seq("n_nationkey"), Seq(HashComponent(Seq("n_nationkey"), 2)),
        data = Some(raw))
      val csvDir = tmpLoc("graft-q62-csv-")
      GraftTools.exportCsv(t, csvDir)
      val viaCsv = GraftTable.create(s, tmpLoc("graft-q62-csvt-"), "nation_q62c",
        raw.schema, Seq("n_nationkey"), Seq(HashComponent(Seq("n_nationkey"), 2)))
      GraftTools.importCsv(s, csvDir, viaCsv)
      val orcDir = tmpLoc("graft-q62-orc-")
      GraftTools.exportOrc(viaCsv, orcDir)
      val viaOrc = GraftTable.create(s, tmpLoc("graft-q62-orct-"), "nation_q62o",
        raw.schema, Seq("n_nationkey"), Seq(HashComponent(Seq("n_nationkey"), 2)))
      GraftTools.importOrc(s, orcDir, viaOrc)
      val pqDir = tmpLoc("graft-q62-pq-")
      GraftTools.exportParquet(viaOrc, pqDir)
      val viaPq = GraftTable.create(s, tmpLoc("graft-q62-pqt-"), "nation_q62p",
        raw.schema, Seq("n_nationkey"), Seq(HashComponent(Seq("n_nationkey"), 2)))
      GraftTools.importParquet(s, pqDir, viaPq)
      viaPq.scan().orderBy("n_nationkey")
    }),

    "q56_sorted_spj" -> ((s, dir) => {
      // Sort-free storage-partitioned join gate (SupportsReportOrdering
      // end to end): documents ⋈ embeddings are co-bucketed AND each
      // bucket is one writer-sorted base file on a clean snapshot, so
      // both scans report per-partition PK order and the SortMergeJoin
      // must plan with ZERO Sort stages on top of the ZERO shuffles SPJ
      // already earns (q30 gates the shuffles; this gates the sorts —
      // at 100 TB those two sorts are the join's largest operators).
      // Broadcast is disabled only while the plan materializes
      // (localCheckpoint, the q40 pattern) so the join stays SMJ.
      Tables.readonly(s, dir, "documents")
      Tables.readonly(s, dir, "embeddings")
      s.conf.set("spark.sql.catalog.gq56",
        classOf[graft.sources.v2.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gq56.warehouse", Tables.cacheRoot(dir))
      s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      val prevB = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val d = s.table("gq56.documents")
        val e = s.table("gq56.embeddings")
        val j = d.join(e, d("doc_id") === e("vec_id"))
          .select(col("doc_id"), col("lang"), size(col("embedding")).as("dim"))
        val out = j.localCheckpoint(true)
        val plan = j.queryExecution.executedPlan.toString
          .split("== Initial Plan ==").head
        if (!plan.contains("SortMergeJoin"))
          throw new IllegalStateException(s"expected an SMJ SPJ plan:\n$plan")
        if (plan.contains("Sort ["))
          throw new IllegalStateException(
            s"ordering report missing — the SMJ planned sorts:\n$plan")
        if (plan.contains("Exchange"))
          throw new IllegalStateException(s"SPJ must be shuffle-free:\n$plan")
        out.orderBy("doc_id")
      } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
    }),

    "q29_point_lookup" -> ((s, dir) => {
      // PK point lookup through the indexed read path: the custom FileIndex
      // prunes to the single hash-bucket file group from table METADATA
      // before any file opens (explain shows numFiles = total/buckets), then
      // the pushed predicate + parquet row-group stats + the key bloom
      // filter narrow inside it — the engine's analog of a Kudu primary-key
      // point get served by a single tablet.
      scan(s, dir, "customer").filter(col("c_custkey") === 42)
    }),

    "q30_colocated_join" -> ((s, dir) => {
      // Storage-partitioned join through the DSv2 catalog (SPARK-37375):
      // documents and embeddings are both hash(4)-bucketed on their key, so
      // the doc_id = vec_id join aligns the reported bucket key-groups and
      // plans with ZERO join shuffles — the co-located PK-PK join posture
      // (shuffle-freedom is asserted by StoragePartitionedJoinSpec; here
      // the result itself is the gate).
      Tables.readonly(s, dir, "documents")
      Tables.readonly(s, dir, "embeddings")
      s.conf.set("spark.sql.catalog.graft_fix",
        classOf[graft.sources.v2.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.graft_fix.warehouse", Tables.cacheRoot(dir))
      s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      val d = s.table("graft_fix.documents")
      val e = s.table("graft_fix.embeddings")
      d.join(e, d("doc_id") === e("vec_id"))
        .select(col("doc_id"), length(col("text")).as("n_chars"),
          size(col("embedding")).as("dim"), col("label"))
        .orderBy("doc_id")
    }),

    "q32_skew_agg" -> ((s, dir) => {
      // Skewed fact-dimension join: every third lineitem row collapses onto
      // ONE hot join key (orderkey 1) — the manufactured analog of a web
      // corpus where a handful of hosts carry a third of the pages. The
      // declared query gates the RESULT; the mitigation posture is
      // two-fold and asserted by SkewJoinSpec: (a) AQE skew-join splits the
      // hot partition at runtime (local SF is far below the 256 MB default
      // threshold, so the spec lowers it to show the split), (b) the salted
      // join (functions.SkewJoin.saltedEquiJoin) spreads the hot key
      // pre-shuffle for when one KEY — not one partition — is hot, which
      // AQE cannot split inside a sort-merge group.
      val l = scan(s, dir, "lineitem").select(
        when(col("l_orderkey") % 3 === 0, lit(1L))
          .otherwise(col("l_orderkey")).as("jk"),
        col("l_quantity"))
      val o = scan(s, dir, "orders").select(col("o_orderkey"), col("o_orderdate"))
      l.join(o, col("jk") === col("o_orderkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(count(lit(1)).as("n_rows"),
          round(sum(col("l_quantity").cast("decimal(28,2)")).cast("double"), 2)
            .as("sum_qty"))
        .orderBy("o_year")
    }),

    "q33_ordered_scan" -> ((s, dir) => {
      // Ordered scan (S12): globally PK-ordered rows with a rank column, so
      // the hash compare verifies the ORDER end-to-end (a mis-ordered scan
      // mis-assigns ranks), not just the row set. Fault tolerance is
      // delegated to Spark's deterministic file splits + task retry — a
      // re-executed task re-reads the same sorted base slice, the scanner
      // resume analog of the reference's ordered fault-tolerant scan.
      // Ranks are DISTRIBUTED and the whole plan stays in Tungsten (no RDD
      // round-trip, no single-partition WindowExec): the key domain is cut
      // into fixed-width buckets (a pure function of the key — immune to
      // partitioning/AQE drift across jobs), a cheap partial-agg pass
      // counts rows per bucket, the driver prefix-sums those counts
      // (#buckets rows), and the global rank is the broadcast bucket offset
      // plus a per-bucket row_number — the Spark analog of the reference's
      // k-way tablet merge (generic_iterators.cc:109), where each "tablet"
      // is a key bucket and the offsets are the merge positions.
      import org.apache.spark.sql.expressions.Window
      val t = Tables.readonly(s, dir, "supplier")
      val base = t.scan()
      val Array(lo, hi, n) = base.agg(
        min("s_suppkey"), max("s_suppkey"), count(lit(1)))
        .collect()(0).toSeq.toArray.map(v => v.asInstanceOf[Long])
      val buckets = math.min(64L, math.max(1L, n / 1000 + 1))
      val width = math.max(1L, (hi - lo) / buckets + 1)
      val bucketed = base.withColumn("_bk",
        expr(s"(s_suppkey - $lo) div $width"))
      val counts = bucketed.groupBy("_bk").agg(count(lit(1)).as("_cnt"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      val offsets = counts.scanLeft((-1L, 0L, 0L)) {
        case ((_, acc, c0), (bk, c)) => (bk, acc + c0, c)
      }.drop(1).map { case (bk, off, _) => (bk, off) }
      import s.implicits._
      val offDf = offsets.toSeq.toDF("_bk", "_off")
      bucketed.join(broadcast(offDf), "_bk")
        .withColumn("rn", (col("_off") + row_number().over(
          Window.partitionBy(col("_bk")).orderBy(col("s_suppkey")))).cast("int"))
        .drop("_bk", "_off")
        .orderBy("s_suppkey")
    }),

    "q34_columnar_agg" -> ((s, dir) => {
      // Columnar serialization (S13): the DSv2 catalog read path serves
      // vectorized parquet ColumnarBatches (StoragePartitionedJoinSpec
      // asserts ColumnarToRow in the plan); the declared query gates the
      // results of an aggregate over that columnar scan.
      Tables.readonly(s, dir, "part")
      s.conf.set("spark.sql.catalog.graft_fix",
        classOf[graft.sources.v2.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.graft_fix.warehouse", Tables.cacheRoot(dir))
      s.table("graft_fix.part")
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("p_retailprice").cast("decimal(28,2)")).cast("double"), 2)
            .as("sum_price"),
          max(col("p_size")).as("max_size"))
        .orderBy("p_brand")
    }),

    "q35_sql_merge" -> ((s, dir) => {
      // SQL MERGE INTO via delta-based row-level operations
      // (sources/v2/RowLevelOps.scala): one statement deletes key 3,
      // renames keys < 10, and inserts key 99 — one atomic delta commit,
      // written executor-side. The final scan hash-checks all three
      // action kinds against the oracle.
      val raw = Tables.raw(s, dir, "nation")
      val loc = tmpLoc("graft-q35-")
      val t = GraftTable.create(s, loc, "nation_q35", raw.schema,
        Seq("n_nationkey"), Seq(HashComponent(Seq("n_nationkey"), 2)),
        data = Some(raw))
      val f = new java.io.File(loc)
      s.conf.set("spark.sql.catalog.gq35",
        classOf[graft.sources.v2.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gq35.warehouse", f.getParent)
      raw.filter(col("n_nationkey") < 10)
        .select(col("n_nationkey").as("k"),
          concat(col("n_name"), lit("_m")).as("nm"))
        .unionByName(raw.limit(1).select(
          (col("n_nationkey") * 0 + 99).as("k"), lit("NEWLAND").as("nm")))
        .createOrReplaceTempView("q35_src")
      s.sql(s"""MERGE INTO gq35.`${f.getName}` t USING q35_src s
        ON t.n_nationkey = s.k
        WHEN MATCHED AND s.k = 3 THEN DELETE
        WHEN MATCHED THEN UPDATE SET n_name = s.nm
        WHEN NOT MATCHED THEN
          INSERT (n_nationkey, n_name, n_regionkey) VALUES (s.k, s.nm, 0)""")
      t.scan().orderBy("n_nationkey")
    }),

    "q36_time_travel" -> ((s, dir) => {
      // SQL time travel (READ_AT_SNAPSHOT): mutate every row across two
      // commits, then read `VERSION AS OF 1` through the catalog — the
      // hash compare proves the v1 snapshot is byte-identical to the
      // original load, untouched by the later upsert and delete.
      val raw = Tables.raw(s, dir, "supplier")
      val loc = tmpLoc("graft-q36-")
      val t = GraftTable.create(s, loc, "supplier_q36", raw.schema,
        Seq("s_suppkey"), Seq(HashComponent(Seq("s_suppkey"), 2)),
        data = Some(raw))
      t.upsert(raw.withColumn("s_name", concat(col("s_name"), lit("_mut"))))
      t.deleteWhere(col("s_suppkey") % 2 === 0)
      val f = new java.io.File(loc)
      s.conf.set("spark.sql.catalog.gq36",
        classOf[graft.sources.v2.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gq36.warehouse", f.getParent)
      s.sql(s"SELECT * FROM gq36.`${f.getName}` VERSION AS OF 1 " +
        "ORDER BY s_suppkey")
    }),

    "q37_tablet_compact" -> ((s, dir) => {
      // Per-tablet MAJOR compaction end-to-end (the O(tablet + deltas)
      // maintenance path a 100 TB table takes instead of compact()'s full
      // rewrite): mutate, fold the two most delta-pressured tablets from
      // the deltaTabletStats pick list, sweep the rest via the per-tablet
      // maintenance policy, and prove the merged result is byte-identical
      // to applying the same mutations in SQL.
      val raw = Tables.raw(s, dir, "customer")
      val t = GraftTable.create(s, tmpLoc("graft-q37-"), "customer_q37",
        raw.schema, Seq("c_custkey"), Seq(HashComponent(Seq("c_custkey"), 2)),
        data = Some(raw))
      t.updateWhere(col("c_nationkey") === 3,
        Map("c_acctbal" -> (col("c_acctbal") + 50)))
      t.deleteWhere(col("c_custkey") % 100 === 0)
      t.deltaTabletStats().collect().headOption
        .foreach(r => t.compactTablet(bucket = Some(r.getInt(0))))
      t.maintain(maxDeltaRatio = 0.0, perTablet = true)
      if (t.meta.deltaFiles.nonEmpty)
        throw new IllegalStateException("per-tablet folds must clear the delta set")
      t.scan().orderBy("c_custkey")
    }),

    "q38_stream_read" -> ((s, dir) => {
      // V2 streaming SOURCE gate (GraftMicroBatchStream): scripted commits,
      // then a REWOUND stream (graft.startingVersion=1) replays every
      // committed mutation version — upsert images only, tombstone-only
      // commits contribute nothing, and a compaction fold re-emits
      // nothing. The accumulated stream hash-checks against the oracle's
      // reconstruction of the committed images (the sink is gated by q18;
      // this gates the source).
      val raw = Tables.raw(s, dir, "nation")
      val loc = tmpLoc("graft-q38-")
      val t = GraftTable.create(s, loc, "nation_q38", raw.schema,
        Seq("n_nationkey"), Seq(HashComponent(Seq("n_nationkey"), 2)),
        data = Some(raw)) // v1: base load — base files never stream
      t.upsert(raw.filter(col("n_nationkey") < 10)
        .withColumn("n_name", concat(col("n_name"), lit("_s2")))) // v2
      t.deleteWhere(col("n_nationkey") % 5 === 0) // v3: tombstones only
      t.upsert(raw.filter(col("n_nationkey") >= 20)
        .withColumn("n_name", concat(col("n_name"), lit("_s4")))) // v4
      t.compact() // v5: fold — re-emits nothing
      val f = new java.io.File(loc)
      s.conf.set("spark.sql.catalog.gq38",
        classOf[graft.sources.v2.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gq38.warehouse", f.getParent)
      val mem = s"q38_acc_${System.nanoTime()}"
      val ckpt = ckptLoc("graft-q38-ckpt-")
      try {
        val q = s.readStream.option("graft.startingVersion", "1")
          .table(s"gq38.`${f.getName}`")
          .writeStream.outputMode("append").format("memory").queryName(mem)
          .option("checkpointLocation", ckpt)
          .start()
        try { q.processAllAvailable() } finally q.stop()
      } finally rmrf(ckpt)
      s.table(mem).orderBy("n_nationkey", "n_name")
    }),

    "q39_txn" -> ((s, dir) => {
      // SQL face of the W9 scoped transaction (CALL txn_*, GraftProcedures):
      // three CALLs stage a strict INSERT, a whole-row UPSERT, and a strict
      // DELETE; txn_commit publishes all of them as ONE snapshot version.
      // A second transaction whose strict DELETE misses must abort as a
      // unit — its (individually valid) staged insert publishes nothing.
      // The final scan hash-checks the committed state against the oracle.
      val raw = Tables.raw(s, dir, "nation")
      val loc = tmpLoc("graft-q39-")
      val t = GraftTable.create(s, loc, "nation_q39", raw.schema,
        Seq("n_nationkey"), Seq(HashComponent(Seq("n_nationkey"), 2)),
        data = Some(raw))
      val f = new java.io.File(loc)
      s.conf.set("spark.sql.catalog.gq39",
        classOf[graft.sources.v2.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gq39.warehouse", f.getParent)
      def call(sql: String) = s.sql(sql).collect()
      val v0 = t.currentVersion
      val id = call(s"CALL gq39.system.txn_begin('${f.getName}')")
        .head.getString(0)
      call(s"""CALL gq39.system.txn_insert('$id', "SELECT CAST(90 AS INT) AS n_nationkey, 'ATLANTIS' AS n_name, CAST(0 AS INT) AS n_regionkey")""")
      call(s"""CALL gq39.system.txn_upsert('$id', "SELECT n_nationkey, n_name || '_tx' AS n_name, n_regionkey FROM gq39.`${f.getName}` WHERE n_nationkey = 1")""")
      call(s"""CALL gq39.system.txn_delete('$id', "SELECT CAST(3 AS INT) AS n_nationkey")""")
      if (t.currentVersion != v0)
        throw new IllegalStateException("staged ops must not be visible before commit")
      val v = call(s"CALL gq39.system.txn_commit('$id')").head.getLong(0)
      if (v != v0 + 1)
        throw new IllegalStateException("a transaction commits exactly one version")
      val id2 = call(s"CALL gq39.system.txn_begin('${f.getName}')")
        .head.getString(0)
      call(s"""CALL gq39.system.txn_insert('$id2', "SELECT CAST(91 AS INT) AS n_nationkey, 'GHOST' AS n_name, CAST(0 AS INT) AS n_regionkey")""")
      call(s"""CALL gq39.system.txn_delete('$id2', "SELECT CAST(999 AS INT) AS n_nationkey")""")
      val aborted =
        try { call(s"CALL gq39.system.txn_commit('$id2')"); false }
        catch { case _: Exception => true }
      if (!aborted || t.currentVersion != v)
        throw new IllegalStateException("a failed transaction must publish nothing")
      t.scan().orderBy("n_nationkey")
    }),

    "q40_mor_spill" -> ((s, dir) => {
      // Shuffle-spill merge-on-read gate: with the broadcast bound forced
      // to 1 byte every delta set exceeds it, so the V2 overlay must serve
      // this delta-carrying table through the per-route sort-merge SPILL
      // path — never refuse, never force a compaction — the 100 TB posture
      // for reads under sustained mutation (the reference applies deltas
      // at any size, tablet/delta_applier.h:52). Scripted upserts + deletes,
      // read back through SQL, hash-checked against the oracle. The result
      // is materialized eagerly (localCheckpoint) because the bound is
      // consulted at scan-planning time and the conf is restored on exit.
      val raw = Tables.raw(s, dir, "customer")
      val loc = tmpLoc("graft-q40-")
      val t = GraftTable.create(s, loc, "customer_q40", raw.schema,
        Seq("c_custkey"), Seq(HashComponent(Seq("c_custkey"), 4)),
        data = Some(raw))
      t.upsert(raw.filter(col("c_nationkey") === 5)
        .withColumn("c_acctbal", col("c_acctbal") + 25))
      t.deleteWhere(col("c_custkey") % 97 === 0)
      if (t.meta.deltaFiles.isEmpty)
        throw new IllegalStateException("the spill gate needs a live delta set")
      val f = new java.io.File(loc)
      s.conf.set("spark.sql.catalog.gq40",
        classOf[graft.sources.v2.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gq40.warehouse", f.getParent)
      s.conf.set("graft.mor.broadcastBytes", "1")
      try s.sql(s"SELECT * FROM gq40.`${f.getName}` ORDER BY c_custkey")
        .localCheckpoint(true)
      finally s.conf.unset("graft.mor.broadcastBytes")
    }),

    "q41_registered_mor" -> ((s, dir) => {
      // Zero-copy handoff gate (S6's last parity gap closed): the raw part
      // parquet is REGISTERED in place — no rewrite, no partition
      // coordinates — then mutated, and read back through the V2 catalog
      // with the broadcast bound forced to 1 byte. The read must serve via
      // the interval-routed shuffle-spill overlay: deltas route to the
      // base files whose recorded first-key footer bounds
      // (DataFileMeta.keyLo/keyHi — the reference's rowset key bounds,
      // tablet/diskrowset.h) can contain their key; the same bounds prune
      // the PK-range predicate below. A registered-in-place 100 TB table
      // under mutation never forces a compaction on the read path
      // (tablet/delta_applier.h:52 applies deltas over any rowset).
      val raw = Tables.raw(s, dir, "part")
      val loc = tmpLoc("graft-q41-")
      val t = graft.table.GraftTable.register(s, loc, "part_q41",
        s"$dir/part.parquet", Seq("p_partkey"))
      t.upsert(raw.filter(col("p_partkey") % 97 === 0)
        .withColumn("p_name", lit("EDITED")))
      t.delete(raw.filter(col("p_partkey") % 101 === 0).select("p_partkey"))
      t.upsert(raw.filter(col("p_partkey") === 1)
        .withColumn("p_partkey", lit(12345678L))
        .withColumn("p_name", lit("NEWPART")))
      if (t.meta.deltaFiles.isEmpty)
        throw new IllegalStateException("the registered-MOR gate needs deltas")
      val f = new java.io.File(loc)
      s.conf.set("spark.sql.catalog.gq41",
        classOf[graft.sources.v2.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gq41.warehouse", f.getParent)
      s.conf.set("graft.mor.broadcastBytes", "1")
      try s.sql(
        s"""SELECT p_partkey, p_name, p_retailprice FROM gq41.`${f.getName}`
           |WHERE p_partkey >= 100 ORDER BY p_partkey""".stripMargin)
        .localCheckpoint(true)
      finally s.conf.unset("graft.mor.broadcastBytes")
    }),

    "q42_routed_flush" -> ((s, dir) => {
      // Routed-flush gate (the reference's DMS flush into per-rowset delta
      // stores, tablet/deltafile.h): after compactDeltas on a partitioned
      // table, every delta file carries its tablet coordinate, and the V2
      // read ATTACHES each tablet's flushed deltas to its own split from
      // disk — with the broadcast bound forced to 1 byte and no spill dir
      // allowed, per-tablet attachment is the only transport left. A tail
      // upsert after the flush then rides the broadcast overlay on top
      // (tail always wins per key); the final state is hash-checked
      // against the oracle.
      val raw = Tables.raw(s, dir, "supplier")
      val loc = tmpLoc("graft-q42-")
      val t = GraftTable.create(s, loc, "supplier_q42", raw.schema,
        Seq("s_suppkey"), Seq(HashComponent(Seq("s_suppkey"), 4)),
        data = Some(raw))
      t.upsert(raw.filter(col("s_nationkey") === 3)
        .withColumn("s_acctbal", col("s_acctbal") + 10))
      t.delete(raw.filter(col("s_suppkey") % 53 === 0).select("s_suppkey"))
      t.compactDeltas()
      val m = t.meta
      if (m.deltaFiles.isEmpty || !m.deltaFiles.forall(_.bucket.isDefined))
        throw new IllegalStateException("the flush gate needs routed delta files")
      val f = new java.io.File(loc)
      s.conf.set("spark.sql.catalog.gq42",
        classOf[graft.sources.v2.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gq42.warehouse", f.getParent)
      s.conf.set("graft.mor.broadcastBytes", "1")
      val flushedCount =
        try s.sql(s"SELECT count(*) FROM gq42.`${f.getName}`").head().getLong(0)
        finally s.conf.unset("graft.mor.broadcastBytes")
      val expected = raw.count() - raw.filter(col("s_suppkey") % 53 === 0).count()
      if (flushedCount != expected)
        throw new IllegalStateException(
          s"flushed attach read returned $flushedCount rows, expected $expected")
      val tmp = java.nio.file.Paths.get(loc, "tmp")
      if (java.nio.file.Files.isDirectory(tmp) &&
          scala.util.Using.resource(java.nio.file.Files.list(tmp))(st =>
            scala.jdk.CollectionConverters.IteratorHasAsScala(st.iterator())
              .asScala.exists(_.getFileName.toString.startsWith("_morspill_"))))
        throw new IllegalStateException(
          "routed attachment must serve without a shuffle spill")
      t.upsert(raw.filter(col("s_suppkey") === 1).withColumn("s_name", lit("TAILED")))
      s.sql(
        s"""SELECT s_suppkey, s_name, s_nationkey, s_acctbal
           |FROM gq42.`${f.getName}` ORDER BY s_suppkey""".stripMargin)
        .localCheckpoint(true)
    }),

    "q43_mor_columnar" -> ((s, dir) => {
      // Columnar merge-on-read gate (S13 under mutation): a delta-carrying
      // table read through the V2 catalog must still serve vectorized
      // ColumnarBatches — the reference never leaves its columnar RowBlocks
      // to apply deltas (tablet/delta_applier.h). Clean tablets pass the
      // stock parquet reader through untouched; dirty tablets filter
      // batches against the broadcast dead set and append their upserts.
      // The plan check throws if the scan ever falls back to row-based, so
      // a columnar regression is a red row, not a silent slowdown.
      val raw = Tables.raw(s, dir, "customer")
      val loc = tmpLoc("graft-q43-")
      val t = GraftTable.create(s, loc, "customer_q43", raw.schema,
        Seq("c_custkey"), Seq(HashComponent(Seq("c_custkey"), 8)),
        data = Some(raw))
      t.upsert(raw.filter(col("c_custkey") % 7 === 0)
        .withColumn("c_acctbal", col("c_acctbal") + 100))
      t.deleteWhere(col("c_custkey") % 53 === 0)
      if (t.meta.deltaFiles.isEmpty)
        throw new IllegalStateException("the columnar-MOR gate needs deltas")
      val f = new java.io.File(loc)
      s.conf.set("spark.sql.catalog.gq43",
        classOf[graft.sources.v2.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gq43.warehouse", f.getParent)
      val df = s.sql(
        s"""SELECT c_nationkey, count(*) AS n,
           |round(CAST(sum(CAST(c_acctbal AS DECIMAL(28,2))) AS DOUBLE), 2) AS bal
           |FROM gq43.`${f.getName}` GROUP BY c_nationkey
           |ORDER BY c_nationkey""".stripMargin)
      // Drive THIS queryExecution to its final AQE plan (df.count() would
      // execute a different one), then read the formatted explain — stage
      // internals (incl. the ColumnarToRow transition) only show there.
      df.queryExecution.toRdd.count()
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      if (!plan.contains("ColumnarToRow"))
        throw new IllegalStateException(
          s"merge-on-read scan must serve columnar batches:\n$plan")
      df
    }),

    "q45_minor_flush" -> ((s, dir) => {
      // Incremental minor delta compaction gate (the reference's repeated
      // minor passes, tablet/delta_compaction.cc): after a full flush, a
      // tail-only pass through the SQL CALL surface must fold ONLY the
      // commits since the flush — the earlier flushed filesets survive in
      // the manifest BY IDENTITY (checked in-query: the O(tail) claim),
      // the folded tail comes out tablet-routed, and the merged read
      // hash-matches the oracle (cross-fileset key overlap resolves by the
      // per-row seq fold).
      val raw = Tables.raw(s, dir, "supplier")
      val loc = tmpLoc("graft-q45-")
      val t = GraftTable.create(s, loc, "supplier_q45", raw.schema,
        Seq("s_suppkey"), Seq(HashComponent(Seq("s_suppkey"), 4)),
        data = Some(raw))
      // a key-modulus filter is non-empty at EVERY scale factor (nationkey 7
      // has zero suppliers at sf0.001, which left the flush nothing to fold)
      t.upsert(raw.filter(col("s_suppkey") % 3 === 0)
        .withColumn("s_acctbal", col("s_acctbal") + 5))
      t.compactDeltas() // full flush: tablet-routed delta files
      val flushed = t.meta.deltaFiles.map(_.path).toSet
      if (flushed.isEmpty || !t.meta.deltaFiles.forall(_.bucket.isDefined))
        throw new IllegalStateException("flush must leave routed delta files")
      // tail commits on top, then the minor pass via SQL
      t.upsert(raw.filter(col("s_suppkey") % 13 === 0)
        .withColumn("s_name", lit("MINOR")))
      t.delete(raw.filter(col("s_suppkey") % 67 === 0).select("s_suppkey"))
      val f = new java.io.File(loc)
      s.conf.set("spark.sql.catalog.gq45",
        classOf[graft.sources.v2.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gq45.warehouse", f.getParent)
      s.sql(s"CALL gq45.system.compact_deltas('${f.getName}', tail_only => true)")
        .collect()
      val after = GraftTable.load(s, loc).meta.deltaFiles
      if (!flushed.subsetOf(after.map(_.path).toSet))
        throw new IllegalStateException(
          "minor pass must keep flushed filesets by identity")
      if (after.exists(d => d.bucket.isEmpty && d.rangeKey.isEmpty))
        throw new IllegalStateException("the folded tail must come out routed")
      s.sql(
        s"""SELECT s_suppkey, s_name, s_nationkey, s_acctbal
           |FROM gq45.`${f.getName}` ORDER BY s_suppkey""".stripMargin)
    }),

    "q49_count_pushdown" -> ((s, dir) => {
      // Metadata-only COUNT(*) (S10 at scale): on a CLEAN snapshot the V2
      // scan serves the count from manifest footer row counts — NO file is
      // opened (in-query plan gate: the batch scan must be GraftCountScan)
      // — the analog of the reference serving count-only scans from
      // live-row-count statistics (master/master.proto:683,704-714). With
      // pending deltas the builder refuses and the count falls back to the
      // real merge-on-read scan; both states are hash-checked (a wrongly
      // metadata-served dirty count would return the stale base count and
      // fail the oracle compare).
      val raw = Tables.raw(s, dir, "supplier")
      val loc = tmpLoc("graft-q49-")
      val t = GraftTable.create(s, loc, "supplier_q49", raw.schema,
        Seq("s_suppkey"), Seq(HashComponent(Seq("s_suppkey"), 4)),
        data = Some(raw))
      val f = new java.io.File(loc)
      s.conf.set("spark.sql.catalog.gq49",
        classOf[graft.sources.v2.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gq49.warehouse", f.getParent)
      // COUNT from footer row counts, MIN/MAX of the lead PK decoded from
      // the order-preserving per-file key bounds — one metadata row, no
      // file opened
      val clean = s.sql(s"SELECT count(*) AS cnt, min(s_suppkey) AS lo, " +
        s"max(s_suppkey) AS hi FROM gq49.`${f.getName}`")
      val cleanScans = clean.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
      }
      if (!cleanScans.exists(_.isInstanceOf[graft.sources.v2.GraftCountScan]))
        throw new IllegalStateException(
          "clean COUNT/MIN/MAX must plan as the metadata-only scan:\n" +
            clean.queryExecution.executedPlan)
      val c = clean.collect().head
      // deleting the low keys MOVES the minimum: a wrongly metadata-served
      // dirty answer would return the stale extremes and fail the oracle
      t.deleteWhere(col("s_suppkey") <= 3) // pending tombstones → dirty
      val d = s.sql(s"SELECT count(*) AS cnt, min(s_suppkey) AS lo, " +
        s"max(s_suppkey) AS hi FROM gq49.`${f.getName}`").collect().head
      import s.implicits._
      Seq(("clean", c.getLong(0), c.getLong(1), c.getLong(2)),
        ("dirty", d.getLong(0), d.getLong(1), d.getLong(2)))
        .toDF("phase", "cnt", "lo", "hi").orderBy("phase")
    }),

    "q50_topn_pushdown" -> ((s, dir) => {
      // TOP-N pushdown gate: ORDER BY lead-PK LIMIT n on a clean
      // range-sorted registered table must CUT the planned fileset via the
      // order-preserving key bounds (in-query assert: the graft scan
      // carries the pushed top-n and plans fewer partitions than files) —
      // the 100 TB posture where "newest 10 events" opens one file. Both
      // directions exercised; the oracle hash-checks the rows.
      // catalog INSTANCES are cached by name per session: the warehouse
      // must be the CONSTANT parent (/tmp) with a unique table dir per
      // invocation, or bench iterations 2+ would silently read iteration
      // 1's table through the cached catalog (q49/q38 use the same shape)
      val rawLoc = tmpLoc("graft-q50raw-")
      val regLoc = tmpLoc("graft-q50-")
      val raw = Tables.raw(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      raw.repartitionByRange(8, col("o_orderkey"))
        .write.mode("overwrite").parquet(rawLoc)
      val f = new java.io.File(regLoc)
      val t = GraftTable.register(s, regLoc, f.getName, rawLoc,
        Seq("o_orderkey"))
      s.conf.set("spark.sql.catalog.gq50",
        classOf[graft.sources.v2.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gq50.warehouse", f.getParent)
      def topn(dir0: String, n: Int) = {
        val q = s.sql(s"SELECT o_orderkey, o_totalprice FROM gq50.`${f.getName}` " +
          s"ORDER BY o_orderkey $dir0 LIMIT $n")
        val v2 = q.queryExecution.executedPlan.collect {
          case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
        }.collectFirst { case sc: graft.sources.v2.GraftV2Scan => sc }
          .getOrElse(throw new IllegalStateException(
            s"expected a graft scan:\n${q.queryExecution.executedPlan}"))
        if (!v2.description().contains("top="))
          throw new IllegalStateException(s"top-n not pushed: ${v2.description()}")
        val parts = v2.planInputPartitions().length
        if (parts >= t.meta.baseFiles.length)
          throw new IllegalStateException(
            s"top-n must cut the fileset: $parts of ${t.meta.baseFiles.length}")
        q
      }
      topn("ASC", 25).union(topn("DESC", 25)).orderBy("o_orderkey")
    }),

    "q53_group_pushdown" -> ((s, dir) => {
      // GROUPED metadata aggregate (per-tablet rollup at scale): on a
      // value-granularity range layout every tablet's files are CONSTANT
      // on the range column (each value derives its own range), so
      // `GROUP BY o_orderstatus` + COUNT/MIN/MAX folds entirely from the
      // manifest's per-file row counts and zone maps — one driver pass,
      // no file opened (in-query gate: the batch scan must be
      // GraftCountScan). The reference analog is the per-tablet
      // live-row-count rollup (master/master.proto:704-714) — here
      // generalized to any layout-constant column. Pending tombstones
      // make the fold unprovable → the dirty phase must fall back to the
      // real merge-on-read scan; both phases hash-check (a wrongly
      // metadata-served dirty answer returns stale counts and extremes).
      val raw = Tables.raw(s, dir, "orders")
      val loc = tmpLoc("graft-q53-")
      val t = GraftTable.create(s, loc, "orders_q53", raw.schema,
        Seq("o_orderkey"), Seq(HashComponent(Seq("o_orderkey"), 2)),
        range = Some(RangeComponent("o_orderstatus", "value")),
        data = Some(raw))
      val f = new java.io.File(loc)
      s.conf.set("spark.sql.catalog.gq53",
        classOf[graft.sources.v2.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gq53.warehouse", f.getParent)
      val sel = s"SELECT o_orderstatus AS grp, count(*) AS n, " +
        s"min(o_orderkey) AS lo_key, max(o_orderkey) AS hi_key " +
        s"FROM gq53.`${f.getName}` GROUP BY o_orderstatus"
      val clean = s.sql(sel)
      val cleanScans = clean.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
      }
      if (!cleanScans.exists(_.isInstanceOf[graft.sources.v2.GraftCountScan]))
        throw new IllegalStateException(
          "clean grouped COUNT/MIN/MAX must plan as the metadata-only scan:\n" +
            clean.queryExecution.executedPlan)
      // snapshot the clean answer BEFORE mutating (DataFrames are lazy)
      val cleanSnap = clean.withColumn("phase", lit("clean"))
        .localCheckpoint(true)
      // deleting the low F keys moves that group's count AND minimum
      t.deleteWhere(col("o_orderstatus") === "F" && col("o_orderkey") % 7 === 0)
      val dirty = s.sql(sel)
      if (dirty.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
      }.exists(_.isInstanceOf[graft.sources.v2.GraftCountScan]))
        throw new IllegalStateException(
          "a delta-carrying snapshot must not serve the grouped metadata aggregate")
      cleanSnap.unionByName(dirty.withColumn("phase", lit("dirty")))
        .select("phase", "grp", "n", "lo_key", "hi_key")
        .orderBy("phase", "grp")
    }),

    "q52_topn_zone" -> ((s, dir) => {
      // TOP-N pushdown on a NON-KEY column via zone maps: events registered
      // zero-copy from time-partitioned raw files (PK event_id — ts is just
      // a data column), `ORDER BY ts LIMIT 20` must cut the planned fileset
      // through the per-file ts bounds in the manifest — "the newest 20
      // events" on a 100 TB log opens the newest file(s), no footer read.
      // Both directions plan-asserted; the oracle hash-checks the epoch
      // values (a projection of ts alone makes the top-20 multiset unique
      // even under ties, so tie order cannot flake the compare).
      val rawLoc = tmpLoc("graft-q52raw-")
      val regLoc = tmpLoc("graft-q52-")
      // INT96 (Spark's default) carries no ordered footer stats — the
      // registration could record no ts bounds and the cut would refuse
      val tsKey = "spark.sql.parquet.outputTimestampType"
      val prevTs = s.conf.getOption(tsKey)
      s.conf.set(tsKey, "TIMESTAMP_MICROS")
      try Tables.raw(s, dir, "events")
        .select("event_id", "ts", "user_id")
        .repartitionByRange(8, col("ts"))
        .write.mode("overwrite").parquet(rawLoc)
      finally prevTs match {
        case Some(v) => s.conf.set(tsKey, v)
        case None => s.conf.unset(tsKey)
      }
      val f = new java.io.File(regLoc)
      val t = GraftTable.register(s, regLoc, f.getName, rawLoc, Seq("event_id"))
      s.conf.set("spark.sql.catalog.gq52",
        classOf[graft.sources.v2.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gq52.warehouse", f.getParent)
      def topn(dir0: String) = {
        val q = s.sql(s"SELECT unix_micros(ts) AS us FROM (SELECT ts FROM " +
          s"gq52.`${f.getName}` ORDER BY ts $dir0 LIMIT 20)")
        val v2 = q.queryExecution.executedPlan.collect {
          case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
        }.collectFirst { case sc: graft.sources.v2.GraftV2Scan => sc }
          .getOrElse(throw new IllegalStateException(
            s"expected a graft scan:\n${q.queryExecution.executedPlan}"))
        if (!v2.description().contains("top=20"))
          throw new IllegalStateException(s"top-n not pushed: ${v2.description()}")
        val parts = v2.planInputPartitions().length
        if (parts >= t.meta.baseFiles.length)
          throw new IllegalStateException(
            s"zone top-n must cut the fileset: $parts of ${t.meta.baseFiles.length}")
        q
      }
      topn("ASC").union(topn("DESC")).orderBy("us")
    }),

    "q51_zorder_cluster" -> ((s, dir) => {
      // Z-ORDER clustering gate: events' PK is event_id, so a PK-sorted
      // layout scatters user_id AND ts across every file — the common
      // "filter a 100 TB event log by user and time window" shape reads
      // everything. CALL cluster (Morton interleave of quantile bins)
      // rewrites the fileset so the per-file zone maps become selective on
      // BOTH columns; the in-query gate proves a 2-D box predicate prunes
      // at least half the files at the MANIFEST level (no footer opened),
      // and the oracle hash-checks the box aggregate itself.
      val raw = Tables.raw(s, dir, "events")
      val t = GraftTable.create(s, tmpLoc("graft-q51-"), "events_q51",
        raw.schema, Seq("event_id"), data = Some(raw))
      t.cluster(Seq("user_id", "ts"), nFiles = 16)
      if (t.meta.operation != "cluster" || t.meta.baseFiles.length != 16)
        throw new IllegalStateException(
          s"clustered rewrite missing: op=${t.meta.operation} " +
            s"files=${t.meta.baseFiles.length}")
      // thresholds derived from the data (scale-proof): bottom user
      // quartile × first time half — integer math, exact in both engines
      val mm = t.scan().agg(
        min("user_id"), max("user_id"),
        unix_micros(min("ts")), unix_micros(max("ts"))).collect().head
      val uq = mm.getLong(0) + (mm.getLong(1) - mm.getLong(0)) / 4
      val tmid = (mm.getLong(2) + mm.getLong(3)) / 2
      val tsLit = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        Math.floorDiv(tmid, 1000000L), Math.floorMod(tmid, 1000000L) * 1000L))
      val filters: Seq[org.apache.spark.sql.sources.Filter] = Seq(
        org.apache.spark.sql.sources.LessThanOrEqual("user_id", uq),
        org.apache.spark.sql.sources.LessThan("ts", tsLit))
      val kept = graft.sources.PartitionPruner.pruneFiles(
        t.meta, t.meta.baseFiles, filters)
      if (kept.length * 2 > t.meta.baseFiles.length)
        throw new IllegalStateException(
          s"zone maps must prune the clustered box: kept ${kept.length} of " +
            s"${t.meta.baseFiles.length}")
      t.scanPruned(filters)
        .filter(col("user_id") <= uq && unix_micros(col("ts")) < tmid)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("user_id").as("su"))
        .orderBy("event_type")
    }),

    "q59_star_zone" -> ((s, dir) => {
      // Runtime-filter ZONE pruning on a star join — the single most common
      // warehouse query shape at 100 TB: a fact table clustered on the
      // dimension key, a selective filter on a dimension ATTRIBUTE (opaque
      // to static inference — Catalyst cannot transfer it to the fact side
      // through the join equality), so only the RUNTIME IN-filter the
      // broadcast dim hands the V2 scan can prune fact files, via the
      // per-file zone maps on the (non-partition) join-key column. The
      // in-query gate reads the scan's own FilesRead/FilesPruned driver
      // metrics and proves at least half the clustered files never opened.
      // graft.runtimeFilter.allColumns is flipped on for the scope (it is
      // what reports the join key as a filterable attribute); the Bench A/B
      // sidecar times this same query with graft.bench.abOff=true, which
      // forces the flag off and skips the gate — the measured pair is the
      // flag's earn-its-default evidence.
      val abOff = s.conf.getOption("graft.bench.abOff").exists(_.toBoolean)
      // fact built once per (JVM, sfDir): the query under measurement is
      // the star JOIN, not the clustered rewrite (q51 gates that); the
      // bench's untimed warmup run absorbs the build
      val loc = q59Fact.computeIfAbsent(dir, _ => {
        val raw = Tables.raw(s, dir, "orders")
        val t = GraftTable.create(s, tmpLoc("graft-q59-"), "orders_q59",
          raw.schema, Seq("o_orderkey"), data = Some(raw))
        t.cluster(Seq("o_custkey", "o_orderkey"), nFiles = 16)
        t.location
      })
      val f = new java.io.File(loc)
      s.conf.set("spark.sql.catalog.gq59",
        classOf[graft.sources.v2.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gq59.warehouse", f.getParent)
      val prev = s.conf.getOption("graft.runtimeFilter.allColumns")
      s.conf.set("graft.runtimeFilter.allColumns", (!abOff).toString)
      try {
        val fact = s.table(s"gq59.`${f.getName}`")
        val cust = Tables.raw(s, dir, "customer")
        // dim attribute correlated with key locality (account cohort by key
        // block — scale-proof integer math, replicated exactly in the
        // oracle); the filter itself is NOT a key predicate, so the only
        // path to fact-file pruning is the runtime filter
        val Array(cmin, cmax) = cust.agg(min("c_custkey"), max("c_custkey"))
          .collect()(0).toSeq.toArray.map(_.asInstanceOf[Long])
        val width = (cmax - cmin) / 8 + 1
        val dim = cust
          .withColumn("grp", expr(s"(c_custkey - $cmin) div $width"))
          .filter(col("grp") === 0)
          .select(col("c_custkey"), col("c_nationkey"))
        val j = fact.join(broadcast(dim), fact("o_custkey") === dim("c_custkey"))
          .groupBy("c_nationkey")
          .agg(count(lit(1)).cast("long").as("n_orders"),
            round(sum(col("o_totalprice").cast("decimal(28,2)")).cast("double"), 2)
              .as("sum_price"))
        val out = j.localCheckpoint(true)
        if (!abOff) {
          def scans(p: org.apache.spark.sql.execution.SparkPlan)
              : Seq[org.apache.spark.sql.execution.datasources.v2.BatchScanExec] = p match {
            case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
              scans(a.executedPlan)
            case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
              scans(q.plan)
            case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => Seq(b)
            case other => other.children.flatMap(scans)
          }
          val scan = scans(j.queryExecution.executedPlan).headOption.getOrElse(
            throw new IllegalStateException(
              s"no BatchScan in q59 plan:\n${j.queryExecution.executedPlan}"))
          val read = scan.metrics(graft.sources.v2.GraftV2Scan.FilesRead).value
          val pruned = scan.metrics(graft.sources.v2.GraftV2Scan.FilesPruned).value
          if (read * 2 > read + pruned)
            throw new IllegalStateException(
              s"runtime zone filter must prune at least half the clustered " +
                s"fact files: read $read, pruned $pruned")
        }
        out.orderBy("c_nationkey")
      } finally prev match {
        case Some(v) => s.conf.set("graft.runtimeFilter.allColumns", v)
        case None => s.conf.unset("graft.runtimeFilter.allColumns")
      }
    }),

    "q48_json_extract" -> ((s, dir) => {
      // Semi-structured payload extraction (the delegated-to-Spark scalar
      // surface over an engine table): pull a JSON field out of the props
      // column, aggregate by type. get_json_object is codegen'd and
      // evaluates inside the scan projection — no UDF, no shuffle beyond
      // the aggregation.
      scan(s, dir, "events")
        .filter(col("props").isNotNull)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(sum("k").as("sum_k"), count(lit(1)).as("n"))
        .orderBy("event_type")
    }),

    "q47_sessionize" -> ((s, dir) => {
      // Gap-based sessionization (8-hour gap) over the engine events
      // table: per-user window lag marks session breaks, a running sum
      // numbers them — one shuffle by user, no single-partition window.
      // The streaming twin (flatMapGroupsWithState with event-time
      // timeout) is proven equal to this batch form in SessionizeSpec;
      // the oracle recomputes the same lag/cumsum in SQL.
      graft.streaming.Sessionize
        .sessions(scan(s, dir, "events"), gapMinutes = 480)
        .orderBy("user_id", "session_idx")
    }),

    "q46_cbo_reorder" -> ((s, dir) => {
      // CBO gate over the ANALYZE statistics (D4 consumed by the planner):
      // a 3-table join written in a deliberately bad textual order —
      // the big fact against the unfiltered dim first, the selectively
      // filtered dim last — must come out of Spark's cost-based join
      // reorder with the filtered dims joined FIRST, which is only
      // visible from the analyze() NDV/min-max/histogram stats served
      // through the V2 scan's columnStats (skipping analyze() keeps the
      // textual order — CboReorderSpec proves the negative). The result
      // hash-checks against the oracle computing the same join in SQL.
      // tables + ANALYZE build once per (JVM, sfDir) — the query under
      // measurement is the stats-driven reorder (planning + join), not
      // the load; the tables are read-only here and the stats are frozen
      // with them (same memoization contract as q59's clustered fact)
      val loc = q46Wh.computeIfAbsent(dir, _ => {
        val l = tmpLoc("graft-q46-")
        def mk(child: String, t: String, keys: Seq[String]): GraftTable = {
          val raw = Tables.raw(s, dir, t)
          GraftTable.create(s, s"$l/$child", child, raw.schema, keys,
            Seq(HashComponent(Seq(keys.head), 4)), data = Some(raw))
        }
        val tf = mk("orders_f", "orders", Seq("o_orderkey"))
        val tc = mk("customer_d", "customer", Seq("c_custkey"))
        val tn = mk("nation_d", "nation", Seq("n_nationkey"))
        Seq(tf, tc, tn).foreach(_.analyze(histograms = true, histogramBins = 16))
        l
      })
      s.conf.set("spark.sql.catalog.gq46",
        classOf[graft.sources.v2.GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.gq46.warehouse", loc)
      val cboPrev = s.conf.getOption("spark.sql.cbo.enabled")
      val reorderPrev = s.conf.getOption("spark.sql.cbo.joinReorder.enabled")
      def restore(k: String, v: Option[String]): Unit = v match {
        case Some(x) => s.conf.set(k, x)
        case None => s.conf.unset(k)
      }
      s.conf.set("spark.sql.cbo.enabled", "true")
      s.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      try {
        val q = s.table("gq46.orders_f")
          .join(s.table("gq46.customer_d"),
            col("o_custkey") === col("c_custkey"))
          .join(s.table("gq46.nation_d").filter(col("n_name") === "NATION_7"),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n"), sum(col("o_custkey")).as("sum_cust"))
          .orderBy(col("c_mktsegment"))
        // in-query plan guard: the innermost join must combine the two
        // DIMS (customer x filtered nation) — the fact staying outermost
        // is the stats-driven order; the textual order would put orders
        // in the innermost join
        val joins = q.queryExecution.optimizedPlan.collect {
          case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
        }
        val innermost = joins.filter(j => j.children.forall(c =>
          c.collect { case jj: org.apache.spark.sql.catalyst.plans.logical.Join => jj }
            .isEmpty))
        val inLeaves = innermost.flatMap(_.collectLeaves()).map(_.toString)
        if (innermost.isEmpty || inLeaves.exists(_.contains("orders_f")) ||
            !inLeaves.exists(_.contains("nation_d")))
          throw new IllegalStateException(
            "CBO must join the filtered dimension first; innermost join " +
              s"reads: ${inLeaves.mkString(", ")}")
        materialized(s, q)
      } finally {
        restore("spark.sql.cbo.enabled", cboPrev)
        restore("spark.sql.cbo.joinReorder.enabled", reorderPrev)
      }
    }),

    "q44_analyze" -> ((s, dir) => {
      // ANALYZE gate (D4): one aggregate job computes per-column stats over
      // the MERGE-ON-READ state (not the base — upserts/deletes below must
      // show) and commits them to the manifest, which the V2 scan serves to
      // Spark's CBO. The exact facets (null count, min, max) hash-check
      // against the oracle recomputing them in SQL; the approximate NDV is
      // range-asserted in-query (HLL values are engine-specific).
      val raw = Tables.raw(s, dir, "supplier")
      val loc = tmpLoc("graft-q44-")
      val t = GraftTable.create(s, loc, "supplier_q44", raw.schema,
        Seq("s_suppkey"), Seq(HashComponent(Seq("s_suppkey"), 4)),
        data = Some(raw))
      t.upsert(raw.filter(col("s_suppkey") % 9 === 0)
        .withColumn("s_acctbal", col("s_acctbal") + 100000))
      t.deleteWhere(col("s_suppkey") % 41 === 0)
      t.analyze()
      val cs = t.meta.colStats.get
      val n = t.scan().count()
      Seq("s_suppkey", "s_nationkey", "s_acctbal").foreach { c =>
        val ndv = cs(c).ndv
        val hi = if (c == "s_nationkey") 30L else n * 2
        if (ndv <= 0 || ndv > hi) throw new IllegalStateException(
          s"implausible NDV for $c: $ndv (rows=$n)")
      }
      import s.implicits._
      // min/max live in the manifest as strings — emit rounded doubles so
      // the compare never depends on float-to-string formatting
      Seq("s_suppkey", "s_nationkey", "s_acctbal").map { c =>
        (c, cs(c).nullCount, cs(c).min.orNull, cs(c).max.orNull)
      }.toDF("col_name", "nulls", "min_s", "max_s")
        .select(col("col_name"), col("nulls"),
          round(col("min_s").cast("double"), 2).as("min_num"),
          round(col("max_s").cast("double"), 2).as("max_num"))
        .orderBy("col_name")
    }),

    "q27_approx_distinct" -> ((s, dir) => {
      // HLL sketch vs exact: emit the exact count (hash-matched against the
      // oracle) plus a boolean asserting the sketch landed within 2%.
      scan(s, dir, "lineitem")
        .agg(countDistinct(col("l_partkey")).as("cnt_d"),
          approx_count_distinct(col("l_partkey"), 0.005).as("approx"))
        .select(col("cnt_d"),
          (abs(col("approx") - col("cnt_d")).cast("double") / col("cnt_d") <= 0.02)
            .as("approx_ok"))
    }))

  val oracleSql: Map[String, String] = Map(
    "q1_scan_project" ->
      "SELECT l_orderkey, l_linenumber, l_partkey, l_quantity FROM lineitem ORDER BY l_orderkey, l_linenumber",
    "q2_mor_upsert_delete" ->
      ("SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, " +
        "CASE WHEN l_orderkey % 100 = 1 THEN l_quantity + 100 ELSE l_quantity END AS l_quantity, " +
        "l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate " +
        "FROM lineitem WHERE l_orderkey % 97 <> 0 ORDER BY l_orderkey, l_linenumber"),
    "q3_pushdown_agg" ->
      ("SELECT count(*) AS cnt, CAST(sum(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_price " +
        "FROM lineitem WHERE l_returnflag = 'R' AND l_linestatus = 'F'"),
    "q4_pk_range" ->
      "SELECT * FROM orders WHERE o_orderkey >= 1000 AND o_orderkey < 2000 ORDER BY o_orderkey",
    "q5_limit" ->
      "SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 100",
    "q6_count_only" ->
      "SELECT count(*) AS cnt FROM lineitem",
    "q7_diff_scan" ->
      ("SELECT o_orderkey, false AS _deleted FROM orders WHERE o_orderkey % 50 = 0 AND o_orderkey % 97 <> 0 " +
        "UNION ALL SELECT o_orderkey, true AS _deleted FROM orders WHERE o_orderkey % 97 = 0 " +
        "ORDER BY o_orderkey"),
    "q8_null_pred" ->
      ("SELECT count(CASE WHEN props IS NULL THEN 1 END) AS null_cnt, " +
        "count(props) AS notnull_cnt FROM events"),
    "q9_in_list" ->
      "SELECT count(*) AS cnt FROM customer WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')",
    "q10_semi_join" ->
      "SELECT count(*) AS cnt FROM lineitem WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size = 5)",
    "q11_contradiction" ->
      "SELECT count(*) AS cnt FROM orders WHERE o_orderkey < 10 AND o_orderkey > 20",
    "q12_prefix" ->
      "SELECT count(*) AS cnt FROM part WHERE p_name LIKE 'sma%'",
    "q13_create_insert" ->
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
    "q14_insert_ignore" ->
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
    "q15_upsert" ->
      ("SELECT n_nationkey, CASE WHEN n_nationkey % 5 = 0 THEN n_name || '_x' ELSE n_name END AS n_name, " +
        "n_regionkey FROM nation ORDER BY n_nationkey"),
    "q16_update" ->
      ("SELECT c_custkey, c_name, c_nationkey, " +
        "CASE WHEN c_nationkey = 7 THEN c_acctbal * 1.1 ELSE c_acctbal END AS c_acctbal, " +
        "c_mktsegment FROM customer ORDER BY c_custkey"),
    "q17_delete" ->
      "SELECT * FROM orders WHERE o_orderstatus <> 'F' ORDER BY o_orderkey",
    "q18_stream_upsert" ->
      ("SELECT event_id, ts, user_id, event_type, " +
        "CASE WHEN event_id % 10 <> 9 THEN value + 1000 ELSE value END AS value, props " +
        "FROM events ORDER BY event_id"),
    "q57_stream_dedup" ->
      ("SELECT event_id, ts, user_id, event_type FROM events ORDER BY event_id"),
    "q58_stream_enrich" ->
      ("SELECT event_id, ts, user_id, c_mktsegment, value " +
        "FROM events JOIN customer ON user_id = c_custkey ORDER BY event_id"),
    "q19_schema_evolution" ->
      ("SELECT c_custkey, c_name AS c_fullname, c_nationkey, c_mktsegment, 'basic' AS c_tier " +
        "FROM customer ORDER BY c_custkey"),
    "q20_join_agg" ->
      ("SELECT l_orderkey, CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue, o_orderdate " +
        "FROM customer, orders, lineitem " +
        "WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey " +
        "AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00' AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00' " +
        "GROUP BY l_orderkey, o_orderdate ORDER BY revenue DESC, l_orderkey LIMIT 10"),
    "q21_tpch_q1" ->
      ("SELECT l_returnflag, l_linestatus, " +
        "round(CAST(sum(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE), 2) AS sum_qty, " +
        "round(CAST(sum(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE), 2) AS sum_base_price, " +
        "round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE), 2) AS sum_disc_price, " +
        "round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,6))) AS DOUBLE), 2) AS sum_charge, " +
        "round(CAST(sum(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) / count(*), 4) AS avg_qty, " +
        "round(CAST(sum(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) / count(*), 4) AS avg_price, " +
        "round(CAST(sum(CAST(l_discount AS DECIMAL(28,4))) AS DOUBLE) / count(*), 4) AS avg_disc, " +
        "count(*) AS count_order " +
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' " +
        "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"),
    "q22_window" ->
      ("SELECT o_custkey, o_orderkey, o_orderdate, CAST(rn AS INTEGER) AS rn FROM (" +
        "SELECT o_custkey, o_orderkey, o_orderdate, " +
        "row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey) AS rn " +
        "FROM orders) t WHERE rn <= 3 ORDER BY o_custkey, rn"),
    "q23_set_ops" ->
      ("SELECT o_orderkey, 'i' AS tag FROM (" +
        "SELECT o_orderkey FROM orders WHERE o_orderkey BETWEEN 0 AND 1000 " +
        "INTERSECT SELECT o_orderkey FROM orders WHERE o_orderkey BETWEEN 500 AND 1500) ti " +
        "UNION ALL SELECT o_orderkey, 'e' AS tag FROM (" +
        "SELECT o_orderkey FROM orders WHERE o_orderkey BETWEEN 0 AND 1000 " +
        "EXCEPT SELECT o_orderkey FROM orders WHERE o_orderkey BETWEEN 500 AND 1500) te " +
        "ORDER BY tag, o_orderkey"),
    "q24_rollup" ->
      ("SELECT l_returnflag, l_linestatus, count(*) AS cnt FROM lineitem " +
        "GROUP BY ROLLUP(l_returnflag, l_linestatus) " +
        "ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"),
    "q25_scalar" ->
      ("SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS o_year, " +
        "CAST(month(o_orderdate) AS INTEGER) AS o_month, " +
        "CAST(floor(o_totalprice) AS BIGINT) AS price_floor, " +
        "abs(o_totalprice - 1000.0) AS price_dist, " +
        "substr(o_orderpriority, 1, 3) AS prio3 FROM orders ORDER BY o_orderkey"),
    "q25_array" ->
      ("SELECT vec_id, CAST(len(embedding) AS INTEGER) AS dim, " +
        "embedding[1] AS first_val, label FROM embeddings ORDER BY vec_id"),
    "q26_stream_window" ->
      ("SELECT date_trunc('hour', ts) AS window_start, event_type, count(*) AS cnt " +
        "FROM events GROUP BY 1, 2 ORDER BY window_start, event_type"),
    "q27_approx_distinct" ->
      "SELECT count(DISTINCT l_partkey) AS cnt_d, true AS approx_ok FROM lineitem",
    "q28_range_drop" ->
      ("SELECT * FROM orders WHERE year(o_orderdate) <> 1995 " +
        "UNION ALL SELECT * FROM orders WHERE o_orderkey = " +
        "(SELECT min(o_orderkey) FROM orders WHERE year(o_orderdate) = 1995) " +
        "ORDER BY o_orderkey"),
    "q29_point_lookup" ->
      "SELECT * FROM customer WHERE c_custkey = 42",
    "q31_range_bounds" ->
      ("SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '1995-01-01 00:00:00' " +
        "OR o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' " +
        "UNION ALL SELECT * FROM orders WHERE o_orderkey = " +
        "(SELECT min(o_orderkey) FROM orders WHERE year(o_orderdate) = 1995) " +
        "ORDER BY o_orderkey"),
    "q54_backup_chain" ->
      ("SELECT s_suppkey, s_name, s_nationkey, " +
        "CASE WHEN s_suppkey % 10 = 7 THEN s_acctbal + 500 ELSE s_acctbal END AS s_acctbal " +
        "FROM supplier WHERE s_suppkey % 10 <> 3 ORDER BY s_suppkey"),
    "q55_replicate" ->
      ("SELECT c_custkey, c_name, c_nationkey, " +
        "CASE WHEN c_custkey % 10 = 9 THEN c_acctbal + 750 ELSE c_acctbal END AS c_acctbal, " +
        "c_mktsegment " +
        "FROM customer WHERE c_custkey % 10 <> 4 ORDER BY c_custkey"),
    "q56_sorted_spj" ->
      ("SELECT doc_id, lang, CAST(len(embedding) AS INTEGER) AS dim " +
        "FROM documents JOIN embeddings ON doc_id = vec_id ORDER BY doc_id"),
    "q30_colocated_join" ->
      ("SELECT doc_id, CAST(length(text) AS INTEGER) AS n_chars, " +
        "CAST(len(embedding) AS INTEGER) AS dim, label " +
        "FROM documents JOIN embeddings ON doc_id = vec_id ORDER BY doc_id"),
    "q32_skew_agg" ->
      ("SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, count(*) AS n_rows, " +
        "round(CAST(sum(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE), 2) AS sum_qty " +
        "FROM (SELECT CASE WHEN l_orderkey % 3 = 0 THEN 1 ELSE l_orderkey END AS jk, " +
        "l_quantity FROM lineitem) l JOIN orders ON jk = o_orderkey " +
        "GROUP BY 1 ORDER BY o_year"),
    "q33_ordered_scan" ->
      ("SELECT s.*, CAST(row_number() OVER (ORDER BY s_suppkey) AS INTEGER) AS rn " +
        "FROM supplier s ORDER BY s_suppkey"),
    "q34_columnar_agg" ->
      ("SELECT p_brand, count(*) AS n, " +
        "round(CAST(sum(CAST(p_retailprice AS DECIMAL(28,2))) AS DOUBLE), 2) AS sum_price, " +
        "max(p_size) AS max_size FROM part GROUP BY 1 ORDER BY p_brand"),
    "q35_sql_merge" ->
      ("SELECT n_nationkey, " +
        "CASE WHEN n_nationkey < 10 THEN n_name || '_m' ELSE n_name END AS n_name, " +
        "n_regionkey FROM nation WHERE n_nationkey <> 3 " +
        "UNION ALL SELECT CAST(99 AS INTEGER), 'NEWLAND', CAST(0 AS INTEGER) " +
        "ORDER BY n_nationkey"),
    "q36_time_travel" ->
      "SELECT * FROM supplier ORDER BY s_suppkey",
    "q37_tablet_compact" ->
      ("SELECT c_custkey, c_name, c_nationkey, " +
        "CASE WHEN c_nationkey = 3 THEN c_acctbal + 50 ELSE c_acctbal END AS c_acctbal, " +
        "c_mktsegment FROM customer WHERE c_custkey % 100 <> 0 ORDER BY c_custkey"),
    "q38_stream_read" ->
      ("SELECT n_nationkey, n_name || '_s2' AS n_name, n_regionkey " +
        "FROM nation WHERE n_nationkey < 10 " +
        "UNION ALL SELECT n_nationkey, n_name || '_s4' AS n_name, n_regionkey " +
        "FROM nation WHERE n_nationkey >= 20 " +
        "ORDER BY n_nationkey, n_name"),
    "q39_txn" ->
      ("SELECT n_nationkey, " +
        "CASE WHEN n_nationkey = 1 THEN n_name || '_tx' ELSE n_name END AS n_name, " +
        "n_regionkey FROM nation WHERE n_nationkey <> 3 " +
        "UNION ALL SELECT CAST(90 AS INTEGER), 'ATLANTIS', CAST(0 AS INTEGER) " +
        "ORDER BY n_nationkey"),
    "q40_mor_spill" ->
      ("SELECT c_custkey, c_name, c_nationkey, " +
        "CASE WHEN c_nationkey = 5 THEN c_acctbal + 25 ELSE c_acctbal END AS c_acctbal, " +
        "c_mktsegment FROM customer WHERE c_custkey % 97 <> 0 ORDER BY c_custkey"),
    "q41_registered_mor" ->
      ("SELECT p_partkey, p_name, p_retailprice FROM (" +
        "SELECT p_partkey, CASE WHEN p_partkey % 97 = 0 THEN 'EDITED' ELSE p_name END AS p_name, " +
        "p_retailprice FROM part WHERE p_partkey % 101 <> 0 " +
        "UNION ALL SELECT CAST(12345678 AS BIGINT), 'NEWPART', " +
        "(SELECT p_retailprice FROM part WHERE p_partkey = 1)" +
        ") WHERE p_partkey >= 100 ORDER BY p_partkey"),
    "q42_routed_flush" ->
      ("SELECT s_suppkey, " +
        "CASE WHEN s_suppkey = 1 THEN 'TAILED' ELSE s_name END AS s_name, " +
        "s_nationkey, " +
        "CASE WHEN s_nationkey = 3 AND s_suppkey <> 1 THEN s_acctbal + 10 " +
        "ELSE s_acctbal END AS s_acctbal " +
        "FROM supplier WHERE s_suppkey % 53 <> 0 ORDER BY s_suppkey"),

    "q43_mor_columnar" ->
      ("SELECT c_nationkey, count(*) AS n, " +
        "round(CAST(sum(CAST(CASE WHEN c_custkey % 7 = 0 " +
        "THEN c_acctbal + 100 ELSE c_acctbal END AS DECIMAL(28,2))) " +
        "AS DOUBLE), 2) AS bal " +
        "FROM customer WHERE c_custkey % 53 <> 0 " +
        "GROUP BY c_nationkey ORDER BY c_nationkey"),

    "q44_analyze" ->
      ("WITH m AS (SELECT s_suppkey, s_nationkey, " +
        "CASE WHEN s_suppkey % 9 = 0 THEN s_acctbal + 100000 " +
        "ELSE s_acctbal END AS s_acctbal " +
        "FROM supplier WHERE s_suppkey % 41 <> 0) " +
        "SELECT 's_acctbal' AS col_name, " +
        "CAST(count(*) - count(s_acctbal) AS BIGINT) AS nulls, " +
        "round(CAST(min(s_acctbal) AS DOUBLE), 2) AS min_num, " +
        "round(CAST(max(s_acctbal) AS DOUBLE), 2) AS max_num FROM m " +
        "UNION ALL SELECT 's_nationkey', " +
        "CAST(count(*) - count(s_nationkey) AS BIGINT), " +
        "round(CAST(min(s_nationkey) AS DOUBLE), 2), " +
        "round(CAST(max(s_nationkey) AS DOUBLE), 2) FROM m " +
        "UNION ALL SELECT 's_suppkey', " +
        "CAST(count(*) - count(s_suppkey) AS BIGINT), " +
        "round(CAST(min(s_suppkey) AS DOUBLE), 2), " +
        "round(CAST(max(s_suppkey) AS DOUBLE), 2) FROM m " +
        "ORDER BY col_name"),

    "q53_group_pushdown" ->
      ("WITH c AS (SELECT 'clean' AS phase, o_orderstatus AS grp, " +
        "CAST(count(*) AS BIGINT) AS n, min(o_orderkey) AS lo_key, " +
        "max(o_orderkey) AS hi_key FROM orders GROUP BY o_orderstatus), " +
        "d AS (SELECT 'dirty' AS phase, o_orderstatus AS grp, " +
        "CAST(count(*) AS BIGINT) AS n, min(o_orderkey) AS lo_key, " +
        "max(o_orderkey) AS hi_key FROM orders " +
        "WHERE NOT (o_orderstatus = 'F' AND o_orderkey % 7 = 0) " +
        "GROUP BY o_orderstatus) " +
        "SELECT * FROM (SELECT * FROM c UNION ALL SELECT * FROM d) " +
        "ORDER BY phase, grp"),

    "q52_topn_zone" ->
      ("WITH a AS (SELECT epoch_us(ts) AS us FROM events ORDER BY ts ASC LIMIT 20), " +
        "d AS (SELECT epoch_us(ts) AS us FROM events ORDER BY ts DESC LIMIT 20) " +
        "SELECT * FROM (SELECT * FROM a UNION ALL SELECT * FROM d) " +
        "ORDER BY us"),

    "q51_zorder_cluster" ->
      ("WITH mm AS (SELECT min(user_id) AS ulo, max(user_id) AS uhi, " +
        "epoch_us(min(ts)) AS tlo, epoch_us(max(ts)) AS thi FROM events) " +
        "SELECT event_type, CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(user_id) AS BIGINT) AS su FROM events, mm " +
        "WHERE user_id <= ulo + (uhi - ulo) // 4 " +
        "AND epoch_us(ts) < (tlo + thi) // 2 " +
        "GROUP BY event_type ORDER BY event_type"),

    "q64_ctas" ->
      ("SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders, " +
        "round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE), 2) AS sum_price " +
        "FROM orders GROUP BY o_custkey ORDER BY o_custkey"),

    // the recalled table's merge-on-read state: base plus the pre-trash
    // upserts, nothing lost and nothing purged
    // the rollup TABLE after one incremental refresh must equal a full
    // recompute over the mutated base (repriced group + vanished group +
    // brand-new group)
    "q68_incr_rollup" ->
      ("WITH final AS (" +
        "SELECT o_orderpriority, o_orderkey, " +
        "CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 2 " +
        "ELSE o_totalprice END AS price " +
        "FROM orders WHERE o_orderpriority = '1-URGENT' " +
        "UNION ALL " +
        "SELECT o_orderpriority, o_orderkey, o_totalprice FROM orders " +
        "WHERE o_orderpriority NOT IN ('1-URGENT', '5-LOW') " +
        "UNION ALL " +
        "SELECT '9-SYNTH', o_orderkey + 10000000, " +
        "CAST((o_orderkey + 10000000) % 1000 AS DOUBLE) " +
        "FROM orders WHERE o_orderkey % 11 = 0) " +
        "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_rows, " +
        "round(CAST(sum(CAST(price AS DECIMAL(28,2))) AS DOUBLE), 2) AS sum_price, " +
        "max(o_orderkey) AS max_key " +
        "FROM final GROUP BY o_orderpriority ORDER BY o_orderpriority"),

    // the oracle recomputes the mutated base from scratch; the engine rows
    // came off the ROLLUP (in-query plan asserts), so the hash match IS the
    // proof the rewrite served the truth
    "q70_mv_rewrite" ->
      ("WITH final AS (" +
        "SELECT o_orderpriority, o_orderkey, " +
        "CASE WHEN o_orderpriority = '1-URGENT' AND o_orderkey % 7 = 0 " +
        "THEN o_totalprice * 2 ELSE o_totalprice END AS price " +
        "FROM orders) " +
        "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_rows, " +
        "round(CAST(sum(CAST(price AS DECIMAL(28,2))) AS DOUBLE), 2) AS sum_price, " +
        "max(o_orderkey) AS max_key " +
        "FROM final GROUP BY o_orderpriority " +
        "UNION ALL " +
        "SELECT '__ALL__', CAST(count(*) AS BIGINT), " +
        "round(CAST(sum(CAST(price AS DECIMAL(28,2))) AS DOUBLE), 2), " +
        "max(o_orderkey) FROM final " +
        "ORDER BY o_orderpriority"),

    // the transparent point query over the mutated base: the renamed row
    // serves under its NEW name, the pre-rename name matches nothing (its
    // index entry tombstoned), 42 rides along untouched — the engine rows
    // came off the INDEX path (in-query plan asserts), so the hash match
    // IS the proof the rewrite served the truth
    "q71_index_rewrite" ->
      ("WITH final AS (SELECT c_custkey, CASE WHEN c_custkey = 11 " +
        "THEN 'RENAMED#000000011' ELSE c_name END AS c_name, " +
        "c_nationkey, c_acctbal, c_mktsegment FROM customer) " +
        "SELECT * FROM final WHERE c_name IN ('RENAMED#000000011', " +
        "'Customer#000000042', 'Customer#000000011') ORDER BY c_custkey"),

    // the range rows over the mutated base: customer 11 was renamed OUT of
    // the interval (its index entry tombstoned), 10 and 12 serve through
    // the spliced interval probe — the in-query plan asserts prove the
    // rows came off the index path, the hash match proves they are true
    "q72_index_range" ->
      ("WITH final AS (SELECT c_custkey, CASE WHEN c_custkey = 11 " +
        "THEN 'ZZZ#000000011' ELSE c_name END AS c_name, " +
        "c_nationkey, c_acctbal, c_mktsegment FROM customer) " +
        "SELECT * FROM final WHERE c_name >= 'Customer#000000010' " +
        "AND c_name <= 'Customer#000000012' ORDER BY c_custkey"),

    // the top-3 names over the mutated base: the old maximum renamed
    // out of the ordering (its index entry moved), the next three serve
    // off the index's extreme entries — plan asserts prove the index
    // path, the hash match proves the rows
    "q74_index_topn" ->
      ("WITH final AS (SELECT c_custkey, CASE WHEN c_custkey = " +
        "(SELECT max(c_custkey) FROM customer) THEN 'AAA#RENAMED' " +
        "ELSE c_name END AS c_name, c_nationkey, c_acctbal, c_mktsegment " +
        "FROM customer) " +
        "SELECT * FROM final ORDER BY c_name DESC LIMIT 3"),

    // the case-folded point query over the mutated base: the re-cased
    // name serves under its NEW lower() value (the old computed entry
    // tombstoned), the pre-rename value matches nothing, 44 rides along
    // untouched — all through the functional-index path (plan-asserted)
    "q75_functional_index" ->
      ("WITH final AS (SELECT c_custkey, CASE WHEN c_custkey = 33 " +
        "THEN 'MIXEDcase#000000033' ELSE c_name END AS c_name, " +
        "c_nationkey, c_acctbal, c_mktsegment FROM customer) " +
        "SELECT * FROM final WHERE lower(c_name) IN ('mixedcase#000000033', " +
        "'customer#000000033', 'customer#000000044') ORDER BY c_custkey"),

    // the composite point query over the mutated base: only customer 20
    // carries the synthetic segment after the trailing-only payload
    // update, and the row serves through the lead+trailing index probe
    "q73_composite_index" ->
      ("WITH final AS (SELECT c_custkey, c_name, c_nationkey, c_acctbal, " +
        "CASE WHEN c_custkey = 20 THEN 'GRAFTSEG' ELSE c_mktsegment END " +
        "AS c_mktsegment FROM customer) " +
        "SELECT * FROM final WHERE c_name IN ('Customer#000000020', " +
        "'Customer#000000021', 'Customer#000000022') " +
        "AND c_mktsegment = 'GRAFTSEG' ORDER BY c_custkey"),

    // the covered grouped count over the mutated base: customer 5 moved
    // into the synthetic segment, and both groups answer from the index
    // alone — the in-query plan asserts prove ZERO base files were read,
    // the hash match proves the counts are true
    "q76_covering_index" ->
      ("WITH final AS (SELECT c_custkey, c_name, c_nationkey, c_acctbal, " +
        "CASE WHEN c_custkey = 5 THEN 'GRAFTSEG' ELSE c_mktsegment END " +
        "AS c_mktsegment FROM customer) " +
        "SELECT c_mktsegment, count(*) AS n, " +
        "CAST(sum(c_nationkey) AS BIGINT) AS sum_nat FROM final " +
        "WHERE c_mktsegment IN ('BUILDING', 'GRAFTSEG') " +
        "GROUP BY c_mktsegment ORDER BY c_mktsegment"),

    // the year-derived counts over the mutated base: order 7 moved to
    // 2032, both the IN and the RANGE shapes answer from the functional
    // index alone (zero-base-read plan asserts in-query); the hash match
    // proves the counts
    "q77_date_index" ->
      ("WITH base AS (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS " +
        "o_odate FROM orders), " +
        "final AS (SELECT o_orderkey, CASE WHEN o_orderkey = 7 THEN " +
        "DATE '2032-01-01' ELSE o_odate END AS o_odate FROM base) " +
        "SELECT 'in' AS tag, count(*) AS n FROM final " +
        "WHERE year(o_odate) IN (1998, 2032) " +
        "UNION ALL " +
        "SELECT 'range' AS tag, count(*) AS n FROM final " +
        "WHERE year(o_odate) >= 1998 ORDER BY tag"),

    // the interval rows over the mutated base: customer 11's nation
    // moved INTO [5, 7] (a fresh index entry), everyone else matches by
    // their original nation — plan asserts prove the clustered-slab
    // index path, the hash match proves the rows
    "q78_clustered_range" ->
      ("WITH final AS (SELECT c_custkey, " +
        "CASE WHEN c_custkey = 11 THEN 6 ELSE c_nationkey END AS " +
        "c_nationkey FROM customer) " +
        "SELECT c_custkey, c_nationkey FROM final WHERE c_nationkey >= 5 " +
        "AND c_nationkey <= 7 ORDER BY c_custkey"),

    // the OR over the mutated base: the renamed row serves under its NEW
    // name through one probe, customer 42 through the OTHER index's
    // acctbal probe (scalar subquery derives the same literal the gate
    // read off the data), one base fetch behind the union — the in-query
    // plan asserts prove the union path, the hash match proves the rows
    "q79_index_union" ->
      ("WITH final AS (SELECT c_custkey, CASE WHEN c_custkey = 7 " +
        "THEN 'RENAMED#000000007' ELSE c_name END AS c_name, " +
        "c_nationkey, c_acctbal, c_mktsegment FROM customer) " +
        "SELECT * FROM final WHERE c_name = 'RENAMED#000000007' OR " +
        "c_acctbal = (SELECT c_acctbal FROM customer WHERE c_custkey = 42) " +
        "ORDER BY c_custkey"),

    // the filtered top-3 over the mutated base: the segment's old top
    // name renamed out of the ordering (its index entry moved), the next
    // three serve off the filtered index walk — plan asserts prove the
    // index path, the hash match proves the rows; the final ORDER BY
    // c_custkey makes row order deterministic either way
    "q80_filtered_topk" ->
      ("WITH final AS (SELECT c_custkey, CASE WHEN c_custkey = " +
        "(SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING' " +
        "ORDER BY c_name DESC LIMIT 1) THEN 'AAA#RENAMED' ELSE c_name END " +
        "AS c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer) " +
        "SELECT * FROM (SELECT * FROM final WHERE c_mktsegment = " +
        "'BUILDING' ORDER BY c_name DESC LIMIT 3) ORDER BY c_custkey"),

    // the enrichment join over the mutated base: the renamed customer
    // joins under its NEW name through its refreshed index entry, 42
    // under its untouched one, the 'nope' key matches nothing — the
    // in-query plan asserts prove the fact side read only the probed
    // tablets, the hash match proves the join rows
    "q81_index_join" ->
      ("WITH final AS (SELECT c_custkey, CASE WHEN c_custkey = 7 " +
        "THEN 'RENAMED#000000007' ELSE c_name END AS c_name, " +
        "c_nationkey, c_acctbal, c_mktsegment FROM customer), " +
        "dim(k, tag) AS (VALUES ('RENAMED#000000007','A')," +
        "('Customer#000000042','B'),('nope','C')) " +
        "SELECT c_custkey, c_name, tag FROM final JOIN dim ON c_name = k " +
        "ORDER BY c_custkey"),

    // the two point rows served through the SQL-created index — the
    // in-query plan asserts prove the create-serve/drop-scan lifecycle,
    // the hash match proves the served rows
    "q83_sql_index" ->
      ("SELECT * FROM customer WHERE c_name IN ('Customer#000000019', " +
        "'Customer#000000036') ORDER BY c_custkey"),

    // the served averages over the mutated base: per-priority avg/count of
    // o_custkey (the urgent %11 orders shifted by +1e6) plus the global
    // '__ALL__' re-derivation — integer sums stay below 2^53, so the
    // double division is bitwise-exact on both engines, no rounding rule
    "q82_mv_avg" ->
      ("WITH final AS (SELECT o_orderpriority, CASE WHEN o_orderpriority " +
        "= '1-URGENT' AND o_orderkey % 11 = 0 THEN o_custkey + 1000000 " +
        "ELSE o_custkey END AS o_custkey FROM orders) " +
        "SELECT * FROM (" +
        "SELECT o_orderpriority, avg(o_custkey) AS avg_cust, " +
        "count(o_custkey) AS n_cust FROM final GROUP BY 1 " +
        "UNION ALL SELECT '__ALL__', avg(o_custkey), count(o_custkey) " +
        "FROM final) ORDER BY o_orderpriority"),

    // lookups by current names return the live rows; the two STALE names
    // (pre-rename, deleted) must return nothing — a refresh that failed to
    // tombstone old entries would resurrect them
    "q69_secondary_lookup" ->
      ("WITH final AS (" +
        "SELECT c_custkey, CASE WHEN c_custkey = 42 " +
        "THEN 'RENAMED#000000042' ELSE c_name END AS c_name, " +
        "c_nationkey, c_acctbal, c_mktsegment " +
        "FROM customer WHERE c_custkey <> 99 " +
        "UNION ALL " +
        "SELECT 10000001, 'SYNTH#000000001', c_nationkey, c_acctbal, " +
        "c_mktsegment FROM customer WHERE c_custkey = 7) " +
        "SELECT * FROM final WHERE c_name IN ('Customer#000000007', " +
        "'RENAMED#000000042', 'SYNTH#000000001', 'Customer#000000099', " +
        "'Customer#000000042') ORDER BY c_custkey"),

    "q67_trash_recall" ->
      ("SELECT n_nationkey, " +
        "CASE WHEN n_nationkey % 4 = 0 THEN n_name || '_T' ELSE n_name END AS n_name, " +
        "n_regionkey FROM nation ORDER BY n_nationkey"),

    // the engine must VERIFY placement (booleans computed from physical
    // files vs locateRow) — the oracle pins the only correct answer
    "q66_locate_row" ->
      ("SELECT s_suppkey, true AS in_located, true AS unique_placement " +
        "FROM (SELECT s_suppkey FROM supplier WHERE s_suppkey % 9 = 0 " +
        "ORDER BY s_suppkey LIMIT 40) ORDER BY s_suppkey"),

    // existing rows keep the immutable s_name and take the +100 balance;
    // fresh keys land whole — exactly UPSERT_IGNORE's contract
    "q65_upsert_ignore_immutable" ->
      ("SELECT s_suppkey, s_name, s_nationkey, " +
        "CASE WHEN s_suppkey % 5 = 0 THEN s_acctbal + 100 ELSE s_acctbal END AS s_acctbal " +
        "FROM supplier " +
        "UNION ALL " +
        "SELECT s_suppkey + 1000000 AS s_suppkey, 'NEW_' || s_name AS s_name, " +
        "s_nationkey, CAST(1.5 AS DOUBLE) AS s_acctbal " +
        "FROM supplier WHERE s_suppkey % 7 = 0 " +
        "ORDER BY s_suppkey"),

    "q63_stream_join" ->
      ("SELECT l.event_id AS l_id, r.event_id AS r_id, l.user_id " +
        "FROM events l JOIN events r ON l.user_id = r.user_id " +
        "AND l.event_id % 2 = 0 AND r.event_id % 2 = 1 " +
        "AND r.ts >= l.ts AND r.ts < l.ts + INTERVAL 30 MINUTE " +
        "ORDER BY l_id, r_id"),

    "q60_table_copy" ->
      ("SELECT s_suppkey, s_name, s_nationkey, " +
        "CASE WHEN s_suppkey % 5 = 0 THEN s_acctbal + 100 ELSE s_acctbal END AS s_acctbal " +
        "FROM supplier WHERE s_suppkey % 11 <> 0 ORDER BY s_suppkey"),

    "q61_loadgen" ->
      ("SELECT CAST(range AS BIGINT) AS id, CAST(range AS VARCHAR) AS payload " +
        "FROM range(5000) ORDER BY id"),

    "q62_import_export" ->
      "SELECT * FROM nation ORDER BY n_nationkey",

    "q59_star_zone" ->
      ("WITH mm AS (SELECT min(c_custkey) AS cmin, max(c_custkey) AS cmax FROM customer), " +
        "dim AS (SELECT c_custkey, c_nationkey FROM customer, mm " +
        "WHERE (c_custkey - cmin) // ((cmax - cmin) // 8 + 1) = 0) " +
        "SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_orders, " +
        "round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE), 2) AS sum_price " +
        "FROM orders JOIN dim ON o_custkey = c_custkey " +
        "GROUP BY c_nationkey ORDER BY c_nationkey"),

    "q50_topn_pushdown" ->
      ("WITH a AS (SELECT o_orderkey, o_totalprice FROM orders " +
        "ORDER BY o_orderkey ASC LIMIT 25), " +
        "d AS (SELECT o_orderkey, o_totalprice FROM orders " +
        "ORDER BY o_orderkey DESC LIMIT 25) " +
        "SELECT * FROM (SELECT * FROM a UNION ALL SELECT * FROM d) " +
        "ORDER BY o_orderkey"),

    "q49_count_pushdown" ->
      ("SELECT 'clean' AS phase, CAST(count(*) AS BIGINT) AS cnt, " +
        "min(s_suppkey) AS lo, max(s_suppkey) AS hi FROM supplier " +
        "UNION ALL SELECT 'dirty', CAST(count(*) AS BIGINT), " +
        "min(s_suppkey), max(s_suppkey) FROM supplier " +
        "WHERE s_suppkey > 3 ORDER BY phase"),

    "q48_json_extract" ->
      ("SELECT event_type, " +
        "CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k, " +
        "CAST(count(*) AS BIGINT) AS n FROM events WHERE props IS NOT NULL " +
        "GROUP BY event_type ORDER BY event_type"),

    "q47_sessionize" ->
      ("WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id FROM events), " +
        "b AS (SELECT user_id, us, event_id, CASE WHEN us - lag(us) OVER " +
        "(PARTITION BY user_id ORDER BY us, event_id) > 28800000000 " +
        "THEN 1 ELSE 0 END AS brk FROM e), " +
        "s AS (SELECT user_id, us, CAST(sum(brk) OVER (PARTITION BY user_id " +
        "ORDER BY us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) " +
        "AS BIGINT) AS session_idx FROM b) " +
        "SELECT user_id, session_idx, CAST(count(*) AS BIGINT) AS n_events, " +
        "min(us) AS first_us, max(us) AS last_us " +
        "FROM s GROUP BY user_id, session_idx ORDER BY user_id, session_idx"),

    "q46_cbo_reorder" ->
      ("SELECT c_mktsegment, count(*) AS n, CAST(sum(o_custkey) AS BIGINT) AS sum_cust " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "WHERE n_name = 'NATION_7' GROUP BY c_mktsegment ORDER BY c_mktsegment"),

    "q45_minor_flush" ->
      ("SELECT s_suppkey, " +
        "CASE WHEN s_suppkey % 13 = 0 THEN 'MINOR' ELSE s_name END AS s_name, " +
        "s_nationkey, " +
        "CASE WHEN s_suppkey % 13 = 0 THEN s_acctbal " +
        "WHEN s_suppkey % 3 = 0 THEN s_acctbal + 5 " +
        "ELSE s_acctbal END AS s_acctbal " +
        "FROM supplier WHERE s_suppkey % 67 <> 0 ORDER BY s_suppkey"))
}
