package graft

import java.nio.file.{Files, Paths}
import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.{HashComponent, RangeComponent}
import graft.table.GraftTable

/**
 * Engine-table definitions over the driver's testdata (FIXTURES.md): PK +
 * hash/range partition spec per table, mirroring the reference's TPC-H
 * fixtures (benchmarks/tpch/tpch-schemas.h — lineitem keyed on
 * l_orderkey+l_linenumber).
 *
 * Registration is zero-copy: the raw Parquet becomes the v1 base fileset of
 * a graft table; mutations commit deltas beside the metadata.
 */
object Tables {

  case class Spec(keys: Seq[String], hash: Seq[HashComponent],
      range: Option[RangeComponent] = None, nonUnique: Boolean = false)

  val specs: Map[String, Spec] = Map(
    "region"     -> Spec(Seq("r_regionkey"), Seq(HashComponent(Seq("r_regionkey"), 2))),
    "nation"     -> Spec(Seq("n_nationkey"), Seq(HashComponent(Seq("n_nationkey"), 2))),
    "customer"   -> Spec(Seq("c_custkey"), Seq(HashComponent(Seq("c_custkey"), 4))),
    "supplier"   -> Spec(Seq("s_suppkey"), Seq(HashComponent(Seq("s_suppkey"), 2))),
    "part"       -> Spec(Seq("p_partkey"), Seq(HashComponent(Seq("p_partkey"), 4))),
    "orders"     -> Spec(Seq("o_orderkey"), Seq(HashComponent(Seq("o_orderkey"), 4)),
      Some(RangeComponent("o_orderdate", "year"))),
    // The driver's lineitem has duplicate (l_orderkey, l_linenumber) pairs —
    // a non-unique PK, which the reference backs with a hidden
    // auto_incrementing_id key column (ColumnSchema.java:529 nonUniqueKey()).
    "lineitem"   -> Spec(Seq("l_orderkey", "l_linenumber"),
      Seq(HashComponent(Seq("l_orderkey"), 8)), nonUnique = true),
    "events"     -> Spec(Seq("event_id"), Seq(HashComponent(Seq("event_id"), 4))),
    "documents"  -> Spec(Seq("doc_id"), Seq(HashComponent(Seq("doc_id"), 4))),
    "embeddings" -> Spec(Seq("vec_id"), Seq(HashComponent(Seq("vec_id"), 4))))

  private val cache = TrieMap[(String, String), GraftTable]()

  /** Bump when the metadata format changes — stale on-disk caches from an
    * older build are then simply ignored instead of mis-loaded. */
  private val CacheFormatVersion = 3

  /** The fixture warehouse for `sfDir` — also what the DSv2 catalog mounts
    * (spark.sql.catalog.<name>.warehouse) for storage-partitioned joins. */
  def cacheRoot(sfDir: String): String = {
    val tag = sfDir.replaceAll("[^A-Za-z0-9]", "_")
    s"${sys.props.getOrElse("java.io.tmpdir", "/tmp")}/graft-cache-v$CacheFormatVersion/$tag"
  }

  /** Shared read-only engine table for scan queries — registered once per
    * JVM per (sfDir, table); the on-disk registration survives across JVMs.
    * Any load failure (corrupt/stale cache) falls back to re-registration. */
  def readonly(spark: SparkSession, sfDir: String, table: String): GraftTable =
    cache.getOrElseUpdate((sfDir, table), {
      val loc = s"${cacheRoot(sfDir)}/$table"
      synchronized {
        val loaded =
          if (GraftTable.exists(loc))
            try {
              val t = GraftTable.load(spark, loc)
              t.meta // force a parse; throws on stale format
              Some(t)
            } catch {
              case _: Exception => GraftTable.drop(loc); None
            }
          else None
        loaded.getOrElse(registerAt(spark, sfDir, table, loc))
      }
    })

  /** Fresh, private engine table for mutation queries — a zero-copy FORK of
    * the shared readonly table: same base files, own delta/metadata dir, so
    * scripted op sequences start from the raw snapshot without
    * re-materializing large bases (non-unique lineitem, converted events). */
  def scratch(spark: SparkSession, sfDir: String, table: String): GraftTable = {
    val loc = Files.createTempDirectory(s"graft-$table-").toString
    GraftTable.fork(spark, readonly(spark, sfDir, table), loc)
  }

  private def registerAt(spark: SparkSession, sfDir: String, table: String,
      loc: String): GraftTable = {
    val spec = specs.getOrElse(table,
      throw new IllegalArgumentException(s"unknown fixture table $table"))
    Files.createDirectories(Paths.get(loc))
    // Materialize a hash/range-partitioned base (create, not zero-copy
    // register): partition coordinates in the fileset are what let
    // scanIndexed / the write-path presence pruning skip whole files, so
    // every declared query exercises the pruned read path — the bulk-load
    // analog, paid once per (sfDir, table) and reused across JVMs.
    // Zero-copy registration remains the API for external parquet handoffs
    // (GraftTable.register; events additionally needs its TIMESTAMP(NANOS)
    // column converted, which raw() does).
    GraftTable.create(spark, loc, table, raw(spark, sfDir, table).schema,
      spec.keys, spec.hash, spec.range, data = Some(raw(spark, sfDir, table)),
      nonUniqueKey = spec.nonUnique)
  }

  /** Raw parquet read (what the DuckDB oracle sees). The events table's
    * nanosecond timestamps are converted to Spark's microsecond TimestampType
    * with integer division (matching DuckDB's ns→µs truncation). */
  def raw(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    if (table == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/$table.parquet")
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(s"$sfDir/$table.parquet")
  }

  /** Scan through the engine's Catalyst-integrated read path: filters the
    * optimizer pushes down prune hash-bucket/range files from table metadata
    * before any file opens (GraftFileIndex). */
  def scan(spark: SparkSession, sfDir: String, table: String): DataFrame =
    readonly(spark, sfDir, table).scanIndexed()
}
