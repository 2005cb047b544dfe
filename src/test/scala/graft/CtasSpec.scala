package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.table.GraftTable

/**
 * SQL CREATE TABLE AS SELECT / REPLACE TABLE AS SELECT through the V2
 * catalog's StagingTableCatalog: writes land in a hidden `.staging` table
 * and publish atomically on commit (the non-staging fallback executed
 * RTAS as drop-then-create-then-write, so a failed write LOST the old
 * table — the data-loss case that motivated staging).
 */
class CtasSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def staged(wh: String): Seq[String] = {
    val d = new java.io.File(s"$wh/.staging")
    if (!d.isDirectory) Nil else d.listFiles().map(_.getName).toSeq
  }

  test("CTAS / RTAS are atomic; failures keep the incumbent and sweep staging") {
    val wh = java.nio.file.Files.createTempDirectory("graft-ctas-").toString
    spark.conf.set("spark.sql.catalog.gctas",
      classOf[graft.sources.v2.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gctas.warehouse", wh)
    spark.sql(
      "CREATE TABLE gctas.t1 PARTITIONED BY (bucket(2, id)) " +
        "TBLPROPERTIES ('graft.keys' = 'id') AS " +
        "SELECT CAST(id AS BIGINT) AS id, CAST(id % 7 AS INT) AS v FROM range(100)")
    assert(spark.table("gctas.t1").count() == 100)
    val t = GraftTable.load(spark, s"$wh/t1")
    assert(t.meta.userKeyCols == Seq("id"))
    assert(staged(wh).isEmpty, s"committed CTAS left staging residue: ${staged(wh)}")
    // RTAS replaces schema+data atomically
    spark.sql(
      "REPLACE TABLE gctas.t1 PARTITIONED BY (bucket(2, id)) " +
        "TBLPROPERTIES ('graft.keys' = 'id') AS " +
        "SELECT CAST(id AS BIGINT) AS id, CAST(id % 3 AS INT) AS v FROM range(50)")
    assert(spark.table("gctas.t1").count() == 50)
    assert(staged(wh).isEmpty)
    // failed CTAS: no table, no residue
    intercept[Exception] {
      spark.sql(
        "CREATE TABLE gctas.t2 PARTITIONED BY (bucket(2, id)) " +
          "TBLPROPERTIES ('graft.keys' = 'id') AS " +
          "SELECT CAST(id AS BIGINT) AS id, " +
          "CAST(raise_error('boom') AS INT) AS v FROM range(10)")
    }
    assert(!GraftTable.exists(s"$wh/t2"), "failed CTAS left a table")
    assert(!new java.io.File(s"$wh/t2").exists(), "failed CTAS left residue")
    assert(staged(wh).isEmpty, s"failed CTAS left staging residue: ${staged(wh)}")
    // failed RTAS keeps the OLD table AND its data — the staging catalog's
    // whole point (drop-then-create lost it)
    intercept[Exception] {
      spark.sql(
        "REPLACE TABLE gctas.t1 PARTITIONED BY (bucket(2, id)) " +
          "TBLPROPERTIES ('graft.keys' = 'id') AS " +
          "SELECT CAST(id AS BIGINT) AS id, " +
          "CAST(raise_error('boom') AS INT) AS v FROM range(10)")
    }
    assert(GraftTable.exists(s"$wh/t1"), "failed RTAS lost the old table")
    assert(spark.table("gctas.t1").count() == 50,
      "failed RTAS must keep the old table's DATA")
    assert(staged(wh).isEmpty, s"failed RTAS left staging residue: ${staged(wh)}")
    // staging dir is invisible to the catalog and warehouse sweeps
    assert(!spark.sql("SHOW TABLES IN gctas").collect()
      .map(_.getString(1)).contains(".staging"))
    // CREATE OR REPLACE works on a missing identity too
    spark.sql(
      "CREATE OR REPLACE TABLE gctas.t3 PARTITIONED BY (bucket(2, id)) " +
        "TBLPROPERTIES ('graft.keys' = 'id') AS " +
        "SELECT CAST(id AS BIGINT) AS id FROM range(7)")
    assert(spark.table("gctas.t3").count() == 7)
    // the replaced-and-dropped incumbent's files are really gone (no
    // *_replaced_* dirs linger beside the table)
    val siblings = new java.io.File(wh).listFiles().map(_.getName)
    assert(!siblings.exists(_.contains("_replaced_")),
      s"replace left an aside dir: ${siblings.mkString(",")}")
    // post-RTAS table is fully functional (mutations + time travel intact)
    import spark.implicits._
    GraftTable.load(spark, s"$wh/t1").upsert(Seq((1L, 99)).toDF("id", "v"))
    assert(spark.table("gctas.t1").where(col("v") === 99).count() == 1)
  }

  test("namespaces: SQL lifecycle + namespaced atomic CTAS") {
    val wh = java.nio.file.Files.createTempDirectory("graft-ctasns-").toString
    spark.conf.set("spark.sql.catalog.gctasns",
      classOf[graft.sources.v2.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gctasns.warehouse", wh)
    spark.sql("CREATE NAMESPACE gctasns.ns1")
    assert(spark.sql("SHOW NAMESPACES IN gctasns").collect()
      .map(_.getString(0)).contains("ns1"))
    // atomic CTAS into the namespace (commit must create/see the parent
    // dir — only the staged path needed that; plain CREATE got it free)
    spark.sql(
      "CREATE TABLE gctasns.ns1.t PARTITIONED BY (bucket(2, id)) " +
        "TBLPROPERTIES ('graft.keys' = 'id') AS " +
        "SELECT CAST(id AS BIGINT) AS id FROM range(30)")
    assert(spark.table("gctasns.ns1.t").count() == 30)
    assert(spark.sql("SHOW TABLES IN gctasns.ns1").collect()
      .map(_.getString(1)).contains("t"))
    // RTAS inside the namespace parks its aside under ns1/.staging —
    // never visible as a table or namespace
    spark.sql(
      "REPLACE TABLE gctasns.ns1.t PARTITIONED BY (bucket(2, id)) " +
        "TBLPROPERTIES ('graft.keys' = 'id') AS " +
        "SELECT CAST(id AS BIGINT) AS id FROM range(12)")
    assert(spark.table("gctasns.ns1.t").count() == 12)
    assert(!spark.sql("SHOW NAMESPACES IN gctasns").collect()
      .map(_.getString(0)).exists(_.startsWith(".")))
    // non-empty drop refuses without CASCADE; cascade drops tables AT ANY
    // DEPTH through the engine path, then the directory skeleton
    spark.sql("CREATE NAMESPACE gctasns.ns1.sub")
    spark.sql(
      "CREATE TABLE gctasns.ns1.sub.u TBLPROPERTIES ('graft.keys' = 'id') " +
        "AS SELECT CAST(id AS BIGINT) AS id FROM range(5)")
    intercept[Exception](spark.sql("DROP NAMESPACE gctasns.ns1"))
    spark.sql("DROP NAMESPACE gctasns.ns1 CASCADE")
    assert(!spark.sql("SHOW NAMESPACES IN gctasns").collect()
      .map(_.getString(0)).contains("ns1"))
    assert(!new java.io.File(s"$wh/ns1").exists())
    // an EMPTY-looking namespace whose only residue is the dot-dir this
    // catalog itself left (an in-namespace REPLACE's .staging) drops
    // WITHOUT cascade — the invisibility contract holds for emptiness too
    spark.sql("CREATE NAMESPACE gctasns.ns2")
    new java.io.File(s"$wh/ns2/.staging").mkdirs()
    spark.sql("DROP NAMESPACE gctasns.ns2")
    assert(!new java.io.File(s"$wh/ns2").exists())
    // nothing may shadow or nest inside a TABLE directory
    spark.sql(
      "CREATE TABLE gctasns.solo TBLPROPERTIES ('graft.keys' = 'id') " +
        "AS SELECT CAST(id AS BIGINT) AS id FROM range(3)")
    intercept[Exception](spark.sql("CREATE NAMESPACE gctasns.solo"))
    intercept[Exception](spark.sql("CREATE NAMESPACE gctasns.solo.inner"))
    intercept[Exception](spark.sql(
      "CREATE TABLE gctasns.solo.inner.x TBLPROPERTIES ('graft.keys' = 'id') " +
        "AS SELECT CAST(id AS BIGINT) AS id FROM range(3)"))
    assert(spark.table("gctasns.solo").count() == 3, "the table must be untouched")
  }

  test("DROP NAMESPACE CASCADE: out-of-namespace fork children refuse UP FRONT; in-namespace ones drop") {
    val wh = java.nio.file.Files.createTempDirectory("graft-ctasfk-").toString
    spark.conf.set("spark.sql.catalog.gctasfk",
      classOf[graft.sources.v2.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gctasfk.warehouse", wh)
    spark.sql("CREATE NAMESPACE gctasfk.ns3")
    spark.sql(
      "CREATE TABLE gctasfk.ns3.p TBLPROPERTIES ('graft.keys' = 'id') " +
        "AS SELECT CAST(id AS BIGINT) AS id FROM range(20)")
    val parent = GraftTable.load(spark, s"$wh/ns3/p")
    // a live fork OUTSIDE the namespace still reads the parent's files by
    // path: the cascade must refuse BEFORE deleting anything (force-
    // dropping the parent would corrupt every later read of the child)
    val childLoc = java.nio.file.Files
      .createTempDirectory("graft-ctasfk-child-").toString + "/child"
    val child = GraftTable.fork(spark, parent, childLoc)
    val e = intercept[Exception](
      spark.sql("DROP NAMESPACE gctasfk.ns3 CASCADE"))
    def rootCause(t: Throwable): Throwable =
      if (t.getCause == null || t.getCause == t) t else rootCause(t.getCause)
    assert(rootCause(e).getMessage.contains("forked children outside"),
      rootCause(e).getMessage)
    // up-front means NOTHING was deleted: the namespace, the parent table,
    // and the child all still read exactly
    assert(spark.table("gctasfk.ns3.p").count() == 20,
      "refused cascade must leave the namespace fully intact")
    assert(child.scan().count() == 20)
    // self-contained child releases the parent; the cascade then succeeds
    // and the child keeps working off its own files (the upsert gives
    // compact() a delta to fold — a delta-free compact is a no-op and
    // would leave the parent-referencing manifest as the only one)
    import spark.implicits._
    child.upsert(Seq(100L).toDF("id"))
    child.compact()
    child.expireVersions(retainLast = 1, olderThanMs = 0L)
    spark.sql("DROP NAMESPACE gctasfk.ns3 CASCADE")
    assert(!new java.io.File(s"$wh/ns3").exists())
    assert(child.scan().count() == 21)
    GraftTable.drop(childLoc, force = true)
    // a fork WHOSE PARENT AND CHILD are both inside the namespace is
    // wholesale-removed by the cascade in any walk order (force path)
    spark.sql("CREATE NAMESPACE gctasfk.ns4")
    spark.sql(
      "CREATE TABLE gctasfk.ns4.q TBLPROPERTIES ('graft.keys' = 'id') " +
        "AS SELECT CAST(id AS BIGINT) AS id FROM range(5)")
    GraftTable.fork(spark, GraftTable.load(spark, s"$wh/ns4/q"), s"$wh/ns4/qc")
    spark.sql("DROP NAMESPACE gctasfk.ns4 CASCADE")
    assert(!new java.io.File(s"$wh/ns4").exists())
  }

  test("sweepStaging reclaims stranded staged tables; fresh ones survive the grace") {
    import org.apache.spark.sql.SparkSession
    implicit val s: SparkSession = spark
    import s.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-ctsweep-").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$wh/ns1"))
    val df = (1 to 20).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    // a stranded staged table at the warehouse root, one under a NAMESPACE
    // dir (both must be found), and a FRESH in-flight one that must survive
    def mkStaged(parent: String, name: String): String = {
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(s"$parent/.staging"))
      GraftTable.create(spark, s"$parent/.staging/$name", name, df.schema,
        Seq("id"), data = Some(df)).location
    }
    val deadRoot = mkStaged(wh, "dead-abc")
    val deadNs = mkStaged(s"$wh/ns1", "dead-def")
    val fresh = mkStaged(wh, "fresh-ghi")
    // backdate the WHOLE tree of the dead ones (the grace reads the newest
    // mtime down to depth 3 — FuzzSpec lesson: inject explicit old
    // FileTimes, a -10s rewind never clears an hour grace)
    val old = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 2L * 3600 * 1000)
    Seq(deadRoot, deadNs).foreach { loc =>
      scala.util.Using.resource(
        java.nio.file.Files.walk(java.nio.file.Paths.get(loc))) { st =>
        st.iterator().forEachRemaining(p =>
          java.nio.file.Files.setLastModifiedTime(p, old))
      }
    }
    val swept = graft.tools.GraftTools.sweepStaging(wh)
    assert(swept.toSet == Set(deadRoot, deadNs), swept.toString)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(deadRoot)))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(deadNs)))
    assert(GraftTable.exists(fresh), "an in-grace staged table must survive")
    // idempotent: nothing left to sweep
    assert(graft.tools.GraftTools.sweepStaging(wh).isEmpty)
  }
}
