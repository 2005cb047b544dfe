package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.{HashComponent, TableMeta}
import graft.table.GraftTable

/**
 * Round-5 table semantics: deterministic intra-batch duplicate handling on
 * UPSERT, O(log n) time-travel version lookup, and the read-default vs
 * write-default split (reference: common/common.proto:134-177 keeps
 * read_default_value and write_default_value separate;
 * AlterTableOptions.changeDefault alters only the latter).
 */
class TableSemanticsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-sem-").toString

  private def kv(rows: (Int, String)*): DataFrame = rows.toDF("k", "v")

  private def newKv(rows: (Int, String)*): GraftTable =
    GraftTable.create(spark, tmp(), "kv",
      StructType(Seq(StructField("k", IntegerType, false), StructField("v", StringType))),
      keys = Seq("k"), hash = Seq(HashComponent(Seq("k"), 2)),
      data = if (rows.isEmpty) None else Some(kv(rows: _*)))

  private def asMap(t: GraftTable): Map[Int, String] =
    t.scan().collect().map(r => r.getInt(0) -> r.getString(1)).toMap

  // ---- intra-batch duplicate keys on upsert ---------------------------

  test("upsert rejects duplicate keys within one batch (unordered commit)") {
    val t = newKv(1 -> "a")
    val dupBatch = kv(2 -> "x", 2 -> "y", 3 -> "c")
    val e = intercept[Exception] { t.upsert(dupBatch) }
    def messages(x: Throwable): Seq[String] =
      Option(x).toSeq.flatMap(ex => Option(ex.getMessage).toSeq ++ messages(ex.getCause))
    assert(messages(e).exists(_.contains("duplicate key within one upsert batch")),
      s"unexpected error: $e")
    // nothing committed — the failed write must not leave partial state
    assert(asMap(t) == Map(1 -> "a"))
    assert(t.currentVersion == 1L)
  }

  test("upsert(lastWinsBy) resolves duplicates by the ordering column") {
    val t = newKv(1 -> "a")
    val batch = Seq((2, "old", 10L), (2, "new", 20L), (3, "c", 1L))
      .toDF("k", "v", "op_seq")
    t.upsert(batch, lastWinsBy = "op_seq")
    assert(asMap(t) == Map(1 -> "a", 2 -> "new", 3 -> "c"))
    // equal ordering values: remaining columns break the tie deterministically
    val tie = Seq((5, "p", 7L), (5, "q", 7L)).toDF("k", "v", "op_seq")
    t.upsert(tie, lastWinsBy = "op_seq")
    val first = asMap(t)(5)
    assert(first == "q") // desc order on v breaks the tie: "q" > "p"
    t.upsert(tie.orderBy(rand()), lastWinsBy = "op_seq")
    assert(asMap(t)(5) == first)
  }

  test("update rejects duplicate keys within one batch") {
    val t = newKv(1 -> "a", 2 -> "b")
    val e = intercept[Exception] {
      t.update(Seq((1, "x"), (1, "y")).toDF("k", "v"))
    }
    def messages(x: Throwable): Seq[String] =
      Option(x).toSeq.flatMap(ex => Option(ex.getMessage).toSeq ++ messages(ex.getCause))
    assert(messages(e).exists(_.contains("duplicate key within one update")), s"$e")
    assert(asMap(t) == Map(1 -> "a", 2 -> "b"))
    t.update(Seq((1, "x")).toDF("k", "v"))
    assert(asMap(t) == Map(1 -> "x", 2 -> "b"))
  }

  // ---- O(log n) time-travel lookup ------------------------------------

  test("versionAtTimestamp binary-searches version files") {
    val loc = tmp()
    val n = 100
    val base = TableMeta("vt", loc, 1L, 1000L, "create",
      Seq(graft.catalog.ColumnMeta(0, "k", "k", IntegerType.json,
        nullable = false, isKey = true)),
      1, Nil, None, Nil, Nil, Nil)
    (1 to n).foreach { v =>
      TableMeta.write(base.copy(version = v.toLong, timestampMs = 1000L * v))
    }
    TableMeta.versionFileReads.set(0L)
    val v = TableMeta.versionAtTimestamp(loc, 1000L * 37 + 1)
    assert(v == 37L)
    val reads = TableMeta.versionFileReads.get()
    val bound = (math.log(n.toDouble) / math.log(2.0)).ceil.toLong + 1
    assert(reads <= bound, s"$reads version-file reads for $n versions (bound $bound)")
    // boundaries
    assert(TableMeta.versionAtTimestamp(loc, 1000L * n + 999) == n.toLong)
    intercept[IllegalArgumentException] { TableMeta.versionAtTimestamp(loc, 999L) }
  }

  // ---- read-default vs write-default ----------------------------------

  test("changeDefault alters writes only; old files keep the read default") {
    val t = newKv(1 -> "a", 2 -> "b")
    // add a column with default d1: rows in files predating the column read d1
    t.addColumn("tier", StringType, nullable = false, default = Some("basic"))
    assert(t.scan().select("tier").distinct().collect().map(_.getString(0)).toSeq
      == Seq("basic"))
    // ALTER the default to d2: history must NOT rewrite
    t.changeDefault("tier", Some("gold"))
    val byK = (df: DataFrame) =>
      df.collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(byK(t.scan().select("k", "tier")) == Map(1 -> "basic", 2 -> "basic"))
    // a new write omitting the column fills with the NEW write default
    t.insert(Seq((3, "c")).toDF("k", "v"))
    assert(byK(t.scan().select("k", "tier"))
      == Map(1 -> "basic", 2 -> "basic", 3 -> "gold"))
    // compaction materializes what each row READS — values must not change
    t.compact()
    assert(byK(t.scan().select("k", "tier"))
      == Map(1 -> "basic", 2 -> "basic", 3 -> "gold"))
    // removeDefault: subsequent absent-column writes get NULL
    t.changeDefault("tier", None)
    t.upsert(Seq((4, "d")).toDF("k", "v"))
    val r4 = t.scan().filter(col("k") === 4).select("tier").collect()(0)
    assert(r4.isNullAt(0))
  }

  test("partition-column ALTERs: rename follows references, drop refuses") {
    val data = Seq((1, "a", 10), (2, "b", 20)).toDF("k", "v", "g")
    val t = GraftTable.create(spark, tmp(), "pt",
      StructType(Seq(StructField("k", IntegerType, false),
        StructField("v", StringType), StructField("g", IntegerType))),
      keys = Seq("k"), hash = Seq(HashComponent(Seq("k"), 2)), data = Some(data))
    // rename the hash column: references follow, layout unchanged, table
    // stays fully functional (write + scan + compact)
    t.renameColumn("k", "id")
    assert(t.meta.hash.head.cols == Seq("id"))
    t.upsert(Seq((3, "c", 30)).toDF("id", "v", "g"))
    assert(t.scan().count() == 3)
    t.compact()
    assert(t.scan().filter(col("id") === 3).count() == 1)
    // dropping a hash (or key) column refuses rather than desyncing
    intercept[IllegalArgumentException] { t.dropColumn("id") }
  }

  test("overwrite is one atomic commit; failed overwrite leaves state intact") {
    val t = newKv(1 -> "a", 2 -> "b")
    t.overwrite(kv(2 -> "B", 9 -> "z"))
    assert(asMap(t) == Map(2 -> "B", 9 -> "z"))
    val vAfter = t.currentVersion
    // duplicate keys in the batch error AND nothing commits — the
    // two-step deleteWhere+upsert form would have truncated first
    intercept[Exception] { t.overwrite(kv(5 -> "x", 5 -> "y")) }
    assert(t.currentVersion == vAfter)
    assert(asMap(t) == Map(2 -> "B", 9 -> "z"))
  }

  test("non-nullable column add requires a default") {
    val t = newKv(1 -> "a")
    intercept[IllegalArgumentException] {
      t.addColumn("n", IntegerType, nullable = false)
    }
    t.addColumn("n", IntegerType, nullable = false, default = Some("7"))
    assert(t.scan().select("n").collect().map(_.getInt(0)).toSeq == Seq(7))
  }

  test("renameTable and setComment are metadata-only ALTERs") {
    val t = newKv(1 -> "a")
    val v0 = t.currentVersion
    t.renameTable("kv_renamed")
    assert(t.meta.name == "kv_renamed")
    t.setComment("v", Some("the value column"))
    assert(t.meta.column("v").comment.contains("the value column"))
    t.setComment("v", None)
    assert(t.meta.column("v").comment.isEmpty)
    intercept[IllegalArgumentException] { t.setComment("nope", Some("x")) }
    // data untouched; history keeps the old name
    assert(asMap(t) == Map(1 -> "a"))
    assert(graft.catalog.TableMeta.read(t.location, v0).name == "kv")
  }
}
