package graft.sources.v2

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/**
 * Executor-local cache for merge-on-read spill slices — the analog of the
 * reference's block cache (cfile/block_cache.h, cfile/block_cache.cc):
 * hot tablets' delta slices are read on every query, and on a real
 * cluster the per-route spill parquet lives on the shared FS, so each
 * repeat read pays a remote fetch. Slices are immutable once published
 * (the spill dir name content-addresses (version, projection, routes) —
 * GraftCatalog's `_morspill_v{version}_{sha}` naming — and a new commit
 * produces new paths), so a local copy keyed by the source path is valid
 * forever; stale versions' entries simply stop being referenced and are
 * evicted by size pressure, oldest-access first.
 *
 * One JVM-wide instance per executor. Counters are exposed for specs
 * (local[*] shares the JVM, so a test reads them directly) and for
 * operational visibility.
 */
object SpillLocalCache {
  /** Soft cap on cached bytes per executor (overridable via system
    * property for tests; a conf can't be read executor-side). */
  def maxBytes: Long =
    sys.props.get("graft.spillCache.maxBytes").map(_.toLong)
      .getOrElse(4L * 1024 * 1024 * 1024)

  val hits = new java.util.concurrent.atomic.AtomicLong
  val misses = new java.util.concurrent.atomic.AtomicLong

  private lazy val root: Path = {
    val d = Paths.get(sys.props("java.io.tmpdir"), "graft-spill-cache")
    Files.createDirectories(d)
    d
  }

  private def keyOf(path: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(path.getBytes("UTF-8")).take(16).map(b => f"$b%02x").mkString +
      ".parquet"
  }

  /** Return a local path serving `path`'s bytes, copying on first use.
    * Concurrent readers of the same slice race benignly: the copy goes to
    * a unique temp name and publishes with an atomic move. Any failure
    * falls back to the source path — the cache is an optimization, never
    * a correctness dependency. */
  def localize(path: String): String = try {
    val dst = root.resolve(keyOf(path))
    if (Files.exists(dst)) {
      hits.incrementAndGet()
      // touch for LRU eviction (best-effort)
      try Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
      catch { case _: Exception => }
      dst.toString
    } else {
      misses.incrementAndGet()
      val tmp = root.resolve(dst.getFileName.toString + "." +
        java.util.UUID.randomUUID().toString.take(8) + ".tmp")
      Files.copy(Paths.get(path), tmp, StandardCopyOption.REPLACE_EXISTING)
      try Files.move(tmp, dst, StandardCopyOption.ATOMIC_MOVE)
      catch { case _: Exception => // lost a publish race: the other copy won
        Files.deleteIfExists(tmp)
      }
      sweepIfOver()
      dst.toString
    }
  } catch { case _: Exception => path }

  /** Evict oldest-accessed entries once the cap is exceeded (down to 3/4
    * of it). Opportunistic, best-effort — a concurrently-read file that
    * fails to delete is skipped. */
  private def sweepIfOver(): Unit = try {
    import scala.jdk.CollectionConverters._
    val entries = scala.util.Using.resource(Files.list(root)) { s =>
      s.iterator().asScala.filter(_.toString.endsWith(".parquet"))
        .map(p => (p, Files.size(p), Files.getLastModifiedTime(p).toMillis))
        .toSeq
    }
    val total = entries.map(_._2).sum
    if (total > maxBytes) {
      var freed = 0L
      entries.sortBy(_._3).iterator
        .takeWhile(_ => total - freed > maxBytes * 3 / 4)
        .foreach { case (p, sz, _) =>
          if (try { Files.deleteIfExists(p) } catch { case _: Exception => false })
            freed += sz
        }
    }
  } catch { case _: Exception => }

  /** Test hook: drop everything and zero the counters. */
  def reset(): Unit = {
    try {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(Files.list(root)) { s =>
        s.iterator().asScala.toSeq
      }.foreach(p => try Files.deleteIfExists(p) catch { case _: Exception => })
    } catch { case _: Exception => }
    hits.set(0); misses.set(0)
  }
}
