package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.HashComponent
import graft.plans.IndexRewrite
import graft.table.GraftTable
import graft.tools.SecondaryIndex

/**
 * Secondary-index query rewrite: a point predicate on an indexed non-key
 * column is answered through the index (plan-time bounded probe + PK-
 * pruned base read) when — and only when — the index is CURRENT; a stale
 * index never serves, scan-sized predicates decline, and the rewritten
 * plan returns exactly the directly-computed rows.
 */
class IndexRewriteSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft-idxrw-").toString

  /** The rewrite's signature: the spliced plan reads a STRICT SUBSET of
    * the base's files (the PK-pruned read behind the probed keys). An
    * unrewritten clean scan reads every base file, an unrewritten dirty
    * MOR plan reads every base file plus deltas, and an unrewritten V2
    * scan exposes no file relation at all — none qualifies. */
  private def served(df: DataFrame, t: GraftTable): Boolean = {
    val baseFiles = t.meta.baseFiles.map(f =>
      new org.apache.hadoop.fs.Path(f.path).toUri.getPath).toSet
    val read = df.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.map(_.toUri.getPath)
              .filter(baseFiles.contains)
          case _ => Nil
        }
    }.flatten.toSet
    read.nonEmpty && read.size < baseFiles.size
  }

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private def mk(): (GraftTable, GraftTable) = {
    val data = (1L to 64L).map(i => (i, s"name_$i", i % 5)).toDF("id", "name", "v")
    val t = GraftTable.create(spark, tmp(), "idxrw", data.schema, Seq("id"),
      Seq(HashComponent(Seq("id"), 4)), data = Some(data))
    val idx = SecondaryIndex.build(spark, t, "name", tmp(), buckets = 8)
    (t, idx) // build auto-arms the rewrite in this session
  }

  test("fresh index serves equality and IN; results equal direct compute; stale declines; refresh restores") {
    val (t, idx) = mk()
    try {
      def q = t.scan().filter(col("name") === "name_7")
      assert(served(q, t), s"fresh index must serve:\n${q.queryExecution.optimizedPlan}")
      IndexRewrite.disable(spark, idx.location)
      val want = rows(q)
      assert(!served(q, t), "deregistered index must keep the scan plan")
      IndexRewrite.enable(spark, idx)
      assert(rows(q) == want, "index-served rows must equal the scan's")
      assert(want.size == 1 && want.head(0) == 7L)

      def qin = t.scan().filter(col("name").isin("name_3", "name_9", "nope"))
      assert(served(qin, t), "IN predicates serve too")
      assert(rows(qin).map(_(0)) == Set(3L, 9L))

      // a predicate on a NON-indexed column keeps the scan
      assert(!served(t.scan().filter(col("v") === 2), t))

      // RESIDUAL conjuncts ride along: the point predicate probes the
      // index, the rest re-applies above the spliced plan
      def qr(p: org.apache.spark.sql.Column) =
        t.scan().filter(col("name").isin("name_8", "name_16", "name_24") && p)
      // the OR-of-equalities form is an IN (no vanilla Catalyst rule
      // normalizes it, so the rewrite recognizes it directly)
      def qor = t.scan().filter(
        col("name") === "name_4" || col("name") === "name_40")
      assert(served(qor, t), "OR of equalities must serve as an IN")
      assert(rows(qor).map(_(0)) == Set(4L, 40L))
      // ... but an OR spanning TWO columns keeps the scan
      assert(!served(t.scan().filter(
        col("name") === "name_4" || col("v") === 2), t))

      // v = id % 5: name_8 -> 3, name_16 -> 1, name_24 -> 4
      assert(served(qr(col("v") >= 2), t), "residual conjuncts must serve")
      assert(rows(qr(col("v") >= 2)).map(_(0)) == Set(8L, 24L),
        "the residual must filter the index-served rows")
      assert(rows(qr(col("v") === 3)).map(_(0)) == Set(8L))
      assert(rows(qr(col("v") === 99)).isEmpty)

      // stale: the base moved past the index watermark — never serve
      t.upsert(Seq((7L, "renamed_7", 0L)).toDF("id", "name", "v"))
      def qs = t.scan().filter(col("name") === "renamed_7")
      assert(!served(qs, t), "a STALE index must never serve")

      // refresh restores serving — now through the V2 relation (the base
      // is delta-dirty; the DSv1 clean-snapshot recognizer correctly
      // declines, while the V2 current-version handle serves and the
      // lookup's base read folds merge-on-read state itself)
      assert(SecondaryIndex.refresh(spark, idx))
      val wh = new java.io.File(t.location)
      spark.conf.set("spark.sql.catalog.gidxrw",
        classOf[graft.sources.v2.GraftCatalog].getName)
      spark.conf.set("spark.sql.catalog.gidxrw.warehouse", wh.getParent)
      def qv2 = spark.table(s"gidxrw.`${wh.getName}`")
        .filter(col("name") === "renamed_7")
      assert(served(qv2, t),
        s"a refreshed index must serve the V2 path on a dirty base:\n${qv2.queryExecution.optimizedPlan}")
      IndexRewrite.disable(spark, idx.location)
      val want2 = rows(qv2)
      IndexRewrite.enable(spark, idx)
      assert(rows(qv2) == want2)
      assert(want2.size == 1 && want2.head(1) == "renamed_7")
      // the old value is gone on the index path too
      assert(rows(spark.table(s"gidxrw.`${wh.getName}`")
        .filter(col("name") === "name_7")).isEmpty)
    } finally IndexRewrite.disable(spark, idx.location)
  }

  test("scan-sized predicates decline: the bounded probe keeps the scan plan") {
    val data = (1L to 40L).map(i => (i, "same", i)).toDF("id", "name", "v")
    val t = GraftTable.create(spark, tmp(), "idxrw_wide", data.schema,
      Seq("id"), Seq(HashComponent(Seq("id"), 2)), data = Some(data))
    val idx = SecondaryIndex.build(spark, t, "name", tmp())
    try {
      spark.conf.set("graft.sindex.rewriteMaxKeys", "5")
      def q = t.scan().filter(col("name") === "same")
      assert(!served(q, t),
        "a predicate matching more than rewriteMaxKeys rows must keep the scan")
      assert(rows(q).size == 40)
    } finally {
      spark.conf.unset("graft.sindex.rewriteMaxKeys")
      IndexRewrite.disable(spark, idx.location)
    }
  }

  test("the spliced plan prunes the base scan to the matched keys' buckets") {
    val (t, idx) = mk()
    try {
      val q = t.scan().filter(col("name") === "name_12")
      assert(served(q, t))
      // the base side of the spliced join reads a PK-pruned file set —
      // fewer files than the full base (id hash(4): 1 of 4 buckets)
      val baseFiles = t.meta.baseFiles.map(f =>
        new org.apache.hadoop.fs.Path(f.path).toUri.getPath).toSet
      val readFiles = q.queryExecution.optimizedPlan.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              fs.location.rootPaths.map(_.toUri.getPath)
                .filter(baseFiles.contains)
            case _ => Nil
          }
      }.flatten
      assert(readFiles.nonEmpty && readFiles.size * 2 <= baseFiles.size,
        s"base read must prune PK buckets: ${readFiles.size} of ${baseFiles.size}")
    } finally IndexRewrite.disable(spark, idx.location)
  }

  test("an index built in one session serves in a NEW session with zero explicit enables") {
    val (t, idx) = mk()
    try {
      val s2 = spark.newSession()
      GraftTable.load(s2, idx.location) // any touch re-arms (load hook)
      val t2 = GraftTable.load(s2, t.location)
      def q = t2.scan().filter(col("name") === "name_5")
      assert(served(q, t2),
        s"loading an index must arm its rewrite:\n${q.queryExecution.optimizedPlan}")
      assert(rows(q).map(_(0)) == Set(5L))
      // opt-out honored, lenient parse
      val s3 = spark.newSession()
      s3.conf.set("graft.sindex.autoRewrite", "off")
      GraftTable.load(s3, idx.location)
      assert(!served(GraftTable.load(s3, t.location).scan()
        .filter(col("name") === "name_5"), t))
    } finally IndexRewrite.disable(spark, idx.location)
  }
}
