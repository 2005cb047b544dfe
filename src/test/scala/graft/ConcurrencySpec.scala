package graft

import java.nio.file.Files
import java.util.concurrent.CyclicBarrier

import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.HashComponent
import graft.table.GraftTable

/** Task-side gate for the MERGE-vs-fold race: the UDF body references this
  * object statically (never serialized), so local-mode tasks and the test
  * thread share the latches. Disarmed (null) the gate is a no-op. */
object MergeRaceGate {
  @volatile var reached: java.util.concurrent.CountDownLatch = _
  @volatile var release: java.util.concurrent.CountDownLatch = _
  def arm(): Unit = {
    reached = new java.util.concurrent.CountDownLatch(1)
    release = new java.util.concurrent.CountDownLatch(1)
  }
  def disarm(): Unit = { reached = null; release = null }
  def pass(id: Long): Long = {
    val r = reached
    val rel = release
    if (r != null && rel != null) {
      r.countDown()
      rel.await(60, java.util.concurrent.TimeUnit.SECONDS)
    }
    id
  }
}

/** Concurrent-writer behavior of the PK mutation surface: the bounded
  * optimistic retry (the engine analog of the reference client's
  * transparent retry of concurrent-modification errors,
  * client/client.h:429-531) re-applies a conflicted op against the new
  * head, so racing ETL writers all land; with retries disabled the
  * first conflict surfaces, and either way the losers leave no orphans
  * and the version chain stays consistent. */
class ConcurrencySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def mkTable(): GraftTable = {
    val loc = Files.createTempDirectory("graft-conc-").toString
    val data = (1 to 20).map(i => (i.toLong, s"n$i")).toDF("id", "name")
    GraftTable.create(spark, loc, "t", data.schema, Seq("id"),
      Seq(HashComponent(Seq("id"), 2)), data = Some(data))
  }

  test("racing writers all commit: conflicts retry against the new head") {
    val t = mkTable()
    val v0 = t.currentVersion
    val n = 4
    val barrier = new CyclicBarrier(n)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until n).map { i =>
      new Thread(() => {
        // distinct key range per writer, released together: every writer
        // reads the same head, so all but one conflict on each version
        val rows = (0 until 5).map(j => (100L + i * 10 + j, s"w$i-$j")).toDF("id", "name")
        barrier.await()
        try if (i % 2 == 0) t.upsert(rows) else t.insert(rows)
        catch { case e: Throwable => failures.add(e) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(failures.isEmpty, s"retry should absorb conflicts: ${failures}")
    // each writer committed exactly one version; every batch fully visible
    assert(t.currentVersion == v0 + n)
    assert(t.scan().filter("id >= 100").count() == n * 5L)
    // the losers' swept attempts left no residue
    assert(graft.tools.GraftTools.fsck(t.location).isEmpty)
  }

  test("graft.commit.maxRetries=0 restores throw-on-first-conflict") {
    val t = mkTable()
    val v0 = t.currentVersion
    spark.conf.set("graft.commit.maxRetries", "0")
    try {
      val n = 4
      val barrier = new CyclicBarrier(n)
      val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val ok = new java.util.concurrent.atomic.AtomicInteger(0)
      val threads = (0 until n).map { i =>
        new Thread(() => {
          val rows = (0 until 5).map(j => (100L + i * 10 + j, s"w$i-$j")).toDF("id", "name")
          barrier.await()
          try { t.upsert(rows); ok.incrementAndGet(); () }
          catch { case e: Throwable => failures.add(e) }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      // whoever won committed one version each; every loser surfaced the
      // commit-guard conflict, not some other error, and left nothing behind
      assert(ok.get() >= 1)
      assert(ok.get() + failures.size == n)
      assert(t.currentVersion == v0 + ok.get())
      failures.forEach { e =>
        assert(e.isInstanceOf[IllegalStateException] &&
          e.getMessage.startsWith("concurrent commit detected"), e.toString)
      }
      assert(t.scan().filter("id >= 100").count() == ok.get() * 5L)
      assert(graft.tools.GraftTools.fsck(t.location).isEmpty)
    } finally spark.conf.unset("graft.commit.maxRetries")
  }

  test("racing maintenance passes yield instead of throwing") {
    val t = mkTable()
    t.upsert((1 to 10).map(i => (i.toLong, s"d$i")).toDF("id", "name"))
    val barrier = new CyclicBarrier(2)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Any]()
    val threads = (1 to 2).map { _ =>
      new Thread(() => {
        barrier.await()
        try results.add(t.maintain(maxDeltaRatio = 0.0001))
        catch { case e: Throwable => results.add(e) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    // a pass that loses the commit race (or finds nothing left) reports
    // false; neither may crash the maintenance loop
    assert(results.stream.allMatch(_.isInstanceOf[java.lang.Boolean]), results.toString)
    assert(results.stream.anyMatch(_ == true))
    assert(t.meta.deltaFiles.isEmpty)
    assert(t.scan().count() == 20)
    assert(graft.tools.GraftTools.fsck(t.location).isEmpty)
  }

  test("writer + maintenance + CDC replication race: destination converges") {
    // the session's moving parts together: a foreground writer (retrying
    // commit conflicts), a concurrent per-tablet maintenance loop
    // (yielding when preempted), and continuous replication off the
    // change stream (folds must be CDC-silent) — the destination must
    // converge to exactly the source's final state
    val src = mkTable()
    val dest = {
      // bootstrap from the current snapshot, then tail changes (the
      // backup-then-replicate pattern: the change stream emits mutation
      // commits only, never the initial base load)
      val loc = Files.createTempDirectory("graft-conc-dest-").toString
      GraftTable.create(spark, loc, "dest", src.meta.schema, Seq("id"),
        Seq(graft.catalog.HashComponent(Seq("id"), 2)), data = Some(src.scan()))
    }
    val q = graft.streaming.GraftStreaming.startReplication(spark, src, dest)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val maintThread = new Thread(() => {
      while (!stop.get()) {
        src.maintain(maxDeltaRatio = 0.001, perTablet = true)
        Thread.sleep(50)
      }
    })
    try {
      maintThread.start()
      (1 to 6).foreach { wave =>
        src.upsert((1 to 10).map(i => (i.toLong, s"w$wave-$i")).toDF("id", "name"))
        if (wave % 2 == 0) src.delete(Seq(100L + wave).map(k => (k, "")).toDF("id", "name"),
          ignore = true)
      }
      stop.set(true); maintThread.join()
      q.processAllAvailable()
    } finally { stop.set(true); q.stop() }
    val srcState = src.scan().collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val destState = dest.scan().collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert((1 to 10).forall(i => srcState(i.toLong) == s"w6-$i"))
    assert(destState == srcState,
      s"replication diverged: missing=${srcState.keySet -- destState.keySet} " +
        s"extra=${destState.keySet -- srcState.keySet}")
    assert(graft.tools.GraftTools.fsck(src.location).isEmpty)
  }

  test("SQL MERGE racing a tablet fold: the fold wins, the MERGE aborts cleanly") {
    // RowLevelOps stamps its target version at PLAN time (optimistic); a
    // maintenance fold that commits while the statement is executing must
    // make the MERGE abort — cleanly: no partial delta fileset, no version
    // churn, and an immediate retry (planned against the new head) lands.
    // The interleave is deterministic: a gate UDF inside the MERGE source
    // blocks the write job mid-flight while the fold commits.
    val t = mkTable()
    t.upsert((1 to 8).map(i => (i.toLong, s"d$i")).toDF("id", "name"))
    val v0 = t.currentVersion
    val whName = java.nio.file.Paths.get(t.location).getFileName.toString
    spark.conf.set("spark.sql.catalog.gconc",
      classOf[graft.sources.v2.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gconc.warehouse",
      java.nio.file.Paths.get(t.location).getParent.toString)
    spark.udf.register("race_gate", (id: Long) => MergeRaceGate.pass(id))
    Seq((1L, "merged"), (200L, "new"))
      .toDF("id", "name").createOrReplaceTempView("race_src")
    val mergeSql =
      s"""MERGE INTO gconc.`$whName` t
         |USING (SELECT race_gate(id) AS id, name FROM race_src) s
         |ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET name = s.name
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin
    MergeRaceGate.arm()
    val err = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val merger = new Thread(() => {
      try spark.sql(mergeSql).collect()
      catch { case e: Throwable => err.set(e) }
    })
    merger.start()
    // the merge job is now running (its write already stamped v0+1) …
    assert(MergeRaceGate.reached.await(60, java.util.concurrent.TimeUnit.SECONDS),
      "merge never reached the gate")
    // … and the fold commits v0+1 out from under it
    t.compactTablet(bucket = Some(0))
    assert(t.currentVersion == v0 + 1)
    MergeRaceGate.release.countDown()
    merger.join(120000)
    val e = err.get()
    assert(e != null, "the MERGE should have lost the optimistic race")
    val chain = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(m => Option(m.getMessage).getOrElse("")).mkString(" | ")
    assert(chain.contains("concurrent commit"), chain)
    // clean abort: no merge rows, no version churn, swept attempt dir
    assert(t.currentVersion == v0 + 1)
    assert(t.scan().filter("id = 200").count() == 0)
    assert(t.scan().filter("id = 1").collect().head.getString(1) == "d1")
    assert(graft.tools.GraftTools.fsck(t.location).isEmpty)
    // a retry plans against the new head and lands
    MergeRaceGate.disarm()
    spark.sql(mergeSql).collect()
    assert(t.scan().filter("id = 200").count() == 1)
    assert(t.scan().filter("id = 1").collect().head.getString(1) == "merged")
    assert(graft.tools.GraftTools.fsck(t.location).isEmpty)
  }

  test("transaction does NOT retry: optimistic abort on concurrent commit") {
    val t = mkTable()
    val e = intercept[IllegalStateException] {
      t.transaction { tx =>
        tx.upsert(Seq((200L, "txn")).toDF("id", "name"))
        // a writer commits mid-transaction → the txn's snapshot is stale
        t.upsert(Seq((201L, "rival")).toDF("id", "name"))
      }
    }
    assert(e.getMessage.startsWith("concurrent commit detected"))
    // the rival's commit stands; the transaction's op does not
    assert(t.scan().filter("id = 201").count() == 1)
    assert(t.scan().filter("id = 200").count() == 0)
  }
}
