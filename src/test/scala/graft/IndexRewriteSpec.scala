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

  test("a non-indexed equality BEFORE the indexed one still serves (any armed conjunct, not the first servable)") {
    val (t, idx) = mk()
    try {
      // v is an un-indexed equality and sits FIRST in the conjunction; the
      // round-14 collectFirst picked it, found no index, and declined the
      // whole rewrite — every servable conjunct is a candidate now
      def q = t.scan().filter(col("v") === 3 && col("name") === "name_8")
      assert(served(q, t),
        s"the indexed conjunct must serve even when a non-indexed equality precedes it:\n${q.queryExecution.optimizedPlan}")
      assert(rows(q).map(_(0)) == Set(8L)) // 8 % 5 == 3
      // and the residual still filters: same shape, contradicting residual
      assert(rows(t.scan().filter(col("v") === 4 && col("name") === "name_8")).isEmpty)
    } finally IndexRewrite.disable(spark, idx.location)
  }

  test("range and prefix predicates on the indexed column serve through the index") {
    val (t, idx) = mk()
    try {
      // BETWEEN (two conjuncts): both bounds MERGE into ONE interval probe
      // (IndexRewrite.servables) and both drop from the residual — probing
      // a half-open `>= lo` alone would over-match for nothing;
      // lexicographic on name_NN strings
      def qr = t.scan().filter(col("name") >= "name_60" && col("name") <= "name_62")
      assert(served(qr, t),
        s"a range predicate on an indexed column must serve:\n${qr.queryExecution.optimizedPlan}")
      assert(rows(qr).map(_(0)) == Set(60L, 61L, 62L))
      // prefix — narrow (1 key) so the strict-subset plan assert is
      // deterministic over 4 PK buckets
      def qn = t.scan().filter(col("name").startsWith("name_19"))
      assert(served(qn, t), "a prefix predicate must serve")
      assert(rows(qn).map(_(0)) == Set(19L))
      // broad prefix: rows stay exact whether or not the 11 matched keys
      // leave a file unread (11 keys usually cover all 4 buckets)
      def qp = t.scan().filter(col("name").startsWith("name_1"))
      assert(rows(qp).map(_(0)) ==
        (Set(1L) ++ (10L to 19L)), rows(qp).map(_(0)).toString)
      // strict < alone
      def ql = t.scan().filter(col("name") < "name_10")
      assert(served(ql, t))
      assert(rows(ql).map(_(0)) == Set(1L)) // only "name_1" sorts below
      // stale decline applies to ranges exactly like points
      t.upsert(Seq((61L, "renamed_61", 0L)).toDF("id", "name", "v"))
      assert(!served(qr, t), "a STALE index must never serve a range")
      assert(SecondaryIndex.refresh(spark, idx))
    } finally IndexRewrite.disable(spark, idx.location)
  }

  test("an over-long IN-list keeps the scan plan and never plans a probe job") {
    val (t, idx) = mk()
    // count PROBE jobs only (call site inside SecondaryIndex) — planning a
    // parquet scan runs its own footer/listing job either way, and that is
    // not what this test bounds
    @volatile var jobs = 0
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val names = js.stageInfos.map(_.name).mkString("|")
        if (names.contains("SecondaryIndex")) {
          jobs += 1
          seen.add(names)
        }
      }
    }
    try {
      spark.conf.set("graft.sindex.rewriteMaxKeys", "5")
      // positive control first: a servable query's PLANNING runs the probe
      // job, proving the listener observes plan-time jobs at all
      spark.sparkContext.addSparkListener(listener)
      t.scan().filter(col("name") === "name_3").queryExecution.optimizedPlan
      Thread.sleep(500)
      assert(jobs > 0, "control: a served rewrite must run a plan-time probe job")
      // 12 literals > rewriteMaxKeys(5): the candidate is discarded BEFORE
      // any probe plan is built — no job, scan plan kept. (The sleep above
      // also drains the control's async listener events before the reset.)
      Thread.sleep(500)
      jobs = 0
      seen.clear()
      val vals = (1 to 12).map(i => s"name_$i")
      def q = t.scan().filter(col("name").isin(vals: _*))
      assert(!served(q, t),
        "an IN-list longer than rewriteMaxKeys must keep the scan plan")
      Thread.sleep(300)
      assert(jobs == 0,
        s"an over-long IN-list must never plan a probe job (saw $jobs: " +
          seen.toArray.mkString("; ") + ")")
      assert(rows(q).size == 12)
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      spark.conf.unset("graft.sindex.rewriteMaxKeys")
      IndexRewrite.disable(spark, idx.location)
    }
  }

  test("composite index: lead-only and lead+trailing conjunctions serve; trailing-only keeps the scan") {
    val data = (1L to 64L).map(i => (i, s"name_$i", s"grp_${i % 4}"))
      .toDF("id", "name", "grp")
    val t = GraftTable.create(spark, tmp(), "idxrw_comp", data.schema,
      Seq("id"), Seq(HashComponent(Seq("id"), 4)), data = Some(data))
    val idx = SecondaryIndex.build(spark, t, Seq("name", "grp"), tmp(),
      buckets = 8)
    try {
      // lead-only equality serves (trailing columns are payload, so a
      // lead probe is complete — no prefix-soundness hazard)
      def q1 = t.scan().filter(col("name") === "name_9")
      assert(served(q1, t), "lead-only equality must serve")
      assert(rows(q1).map(_(0)) == Set(9L))
      // lead + trailing equality: the trailing conjunct pushes into the
      // probe AND re-applies as residual — exact either way
      def q2 = t.scan().filter(
        col("name").isin("name_8", "name_16") && col("grp") === "grp_0")
      assert(served(q2, t), "lead+trailing conjunction must serve")
      assert(rows(q2).map(_(0)) == Set(8L, 16L))
      def q3 = t.scan().filter(
        col("name").isin("name_8", "name_16") && col("grp") === "grp_1")
      assert(rows(q3).isEmpty, "the trailing equality must filter exactly")
      // trailing-only predicates keep the scan (no lead probe → no bucket
      // pruning; conservative by design)
      assert(!served(t.scan().filter(col("grp") === "grp_2"), t))
      // refresh covers a trailing-value change (same index KEY, upsert
      // rewrites the payload); compact + catch-up refresh returns the base
      // to a clean snapshot so the DSv1 recognizer serves again (the dirty
      // interval is covered by the V2-path test in the first suite case)
      t.upsert(Seq((8L, "name_8", "grp_X")).toDF("id", "name", "grp"))
      assert(SecondaryIndex.refresh(spark, idx))
      t.compact()
      assert(SecondaryIndex.refresh(spark, idx)) // watermark catch-up
      def q4 = t.scan().filter(col("name") === "name_8" && col("grp") === "grp_X")
      assert(served(q4, t), "a refreshed composite index must serve")
      assert(rows(q4).map(_(0)) == Set(8L))
      assert(rows(t.scan().filter(
        col("name") === "name_8" && col("grp") === "grp_0")).isEmpty)
    } finally IndexRewrite.disable(spark, idx.location)
  }

  test("ORDER BY indexed column LIMIT k serves through the index; nulls-first, short-index, and big-k decline") {
    val (t, idx) = mk()
    try {
      // lexicographic: name_9 > name_8 > name_7 > name_64 > ...
      def qd = t.scan().orderBy(col("name").desc).limit(3)
      assert(served(qd, t),
        s"DESC top-k must serve through the index:\n${qd.queryExecution.optimizedPlan}")
      assert(qd.collect().map(_.getLong(0)).toSeq == Seq(9L, 8L, 7L))
      // ASC defaults to NULLS FIRST — the index never holds null leads,
      // so the conservative rule keeps the scan; explicit NULLS LAST serves
      assert(!served(t.scan().orderBy(col("name").asc).limit(3), t))
      def qa = t.scan().orderBy(col("name").asc_nulls_last).limit(2)
      assert(served(qa, t), "ASC NULLS LAST top-k must serve")
      assert(qa.collect().map(_.getLong(0)).toSeq == Seq(1L, 10L))
      // k past rewriteMaxKeys keeps the scan
      spark.conf.set("graft.sindex.rewriteMaxKeys", "2")
      try assert(!served(t.scan().orderBy(col("name").desc).limit(3), t))
      finally spark.conf.unset("graft.sindex.rewriteMaxKeys")
      // stale declines; refresh + compact (clean snapshot) + catch-up serves
      t.upsert(Seq((9L, "aaa_renamed", 4L)).toDF("id", "name", "v"))
      assert(!served(qd, t), "a STALE index must never serve a top-k")
      assert(SecondaryIndex.refresh(spark, idx))
      t.compact()
      assert(SecondaryIndex.refresh(spark, idx))
      assert(served(qd, t))
      assert(qd.collect().map(_.getLong(0)).toSeq == Seq(8L, 7L, 64L),
        "the renamed row must leave the top-k")
    } finally IndexRewrite.disable(spark, idx.location)
  }

  test("top-k never serves past the index's non-null entries (null rows could pad the true answer)") {
    import spark.implicits._
    val data = Seq((1L, "a"), (2L, "b"), (3L, null), (4L, "c"))
      .toDF("id", "name")
    val t = GraftTable.create(spark, tmp(), "idxrw_null", data.schema,
      Seq("id"), Seq(HashComponent(Seq("id"), 2)), data = Some(data))
    val idx = SecondaryIndex.build(spark, t, "name", tmp(), buckets = 4)
    try {
      // k=4 > 3 non-null entries: a DESC NULLS LAST top-4 must include the
      // null row the index cannot see — keep the scan
      def q4 = t.scan().orderBy(col("name").desc).limit(4)
      assert(!served(q4, t), "top-k past the non-null count must decline")
      assert(q4.collect().length == 4)
      // k=2 fits: serves, and the null row never appears
      def q2 = t.scan().orderBy(col("name").desc).limit(2)
      assert(served(q2, t))
      assert(q2.collect().map(_.getLong(0)).toSeq == Seq(4L, 2L))
    } finally IndexRewrite.disable(spark, idx.location)
  }

  test("functional index: lower(col) predicates serve, refresh re-derives, unsupported exprs refuse") {
    val data = (1L to 64L).map(i => (i, s"Name_$i", i % 5)).toDF("id", "name", "v")
    val t = GraftTable.create(spark, tmp(), "idxrw_fn", data.schema, Seq("id"),
      Seq(HashComponent(Seq("id"), 4)), data = Some(data))
    val idx = SecondaryIndex.buildExpression(spark, t, "LOWER(name)", tmp(),
      buckets = 8)
    try {
      assert(idx.properties(SecondaryIndex.ExprKey) == "lower(name)")
      def q = t.scan().filter(lower(col("name")) === "name_7")
      assert(served(q, t),
        s"a functional index must serve its expression predicate:\n${q.queryExecution.optimizedPlan}")
      assert(rows(q).map(_(0)) == Set(7L))
      // IN over the expression serves too; a DIFFERENT expression keeps
      // the scan (upper does not canonicalize to lower)
      assert(served(t.scan().filter(
        lower(col("name")).isin("name_3", "name_9")), t))
      assert(!served(t.scan().filter(upper(col("name")) === "NAME_7"), t))
      // ... and so does the bare column (the index holds lower() values)
      assert(!served(t.scan().filter(col("name") === "Name_7"), t))
      // refresh re-derives the expression for mutated keys
      t.upsert(Seq((7L, "RENAMED_7", 0L)).toDF("id", "name", "v"))
      assert(!served(q, t), "a STALE functional index must never serve")
      assert(SecondaryIndex.refresh(spark, idx))
      t.compact()
      assert(SecondaryIndex.refresh(spark, idx))
      def q2 = t.scan().filter(lower(col("name")) === "renamed_7")
      assert(served(q2, t))
      assert(rows(q2).map(_(0)) == Set(7L))
      assert(rows(t.scan().filter(lower(col("name")) === "name_7")).isEmpty)
      // top-k on the expression serves through the same canon matching
      def qt = t.scan().orderBy(lower(col("name")).desc).limit(2)
      assert(served(qt, t), "top-k on the indexed expression must serve")
      // lower: renamed_7 > name_9 lexicographically ('r' > 'n')
      assert(qt.collect().map(_.getLong(0)).toSeq == Seq(7L, 9L))
      // out-of-language expressions refuse up front
      intercept[IllegalArgumentException] {
        SecondaryIndex.buildExpression(spark, t, "name || 'x'", tmp())
      }
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
