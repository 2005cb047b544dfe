package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // A failed query must surface as a RED row in the driver's CORRECTNESS,
    // never as a silently-missing key (round 8 shrank 56→53 entries with no
    // visible error). Two markers: a present-but-unreadable result dir whose
    // only file is _ERROR (the driver's parquet read of it fails loudly),
    // plus an errors.json sidecar naming every failure.
    val failures = scala.collection.mutable.LinkedHashMap[String, String]()
    // Dev loop only (the driver never sets it): restrict the dump to a
    // comma-separated subset, mirroring SPARK_GRAFT_BENCH_ONLY.
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    SparkEntry.queries
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
        System.err.println(s"[verify] $name FAILED: $msg")
        failures(name) = msg
        val d = Paths.get(s"$outDir/$name")
        if (Files.exists(d))
          Files.walk(d).sorted(java.util.Comparator.reverseOrder())
            .forEach(p => Files.deleteIfExists(p))
        Files.createDirectories(d)
        Files.writeString(d.resolve("_ERROR"), s"$name: $msg")
      }
      // per-run pipeline caches die with their query; memoized frames stay.
      // Auto-scheduled maintenance on query scratch tables is cleared too —
      // a background fold must not race a later query's parquet dump.
      finally {
        Pipeline.releaseTransient()
        graft.table.MaintenanceScheduler.clearAuto()
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val errJson = failures
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
    if (failures.nonEmpty)
      System.err.println(s"[verify] ERRORS: ${failures.keys.mkString(",")}")
    Pipeline.releaseCaches() // no cached RDDs may outlive the run
    spark.stop()
  }
}
