package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Dumps run CONCURRENTLY on one SparkSession (default 4 threads,
  * `SPARK_GRAFT_VERIFY_THREADS` to tune, 1 = the old serial path):
  * a single registry query rarely keeps all cores busy end-to-end
  * (driver-side planning, parquet footer reads, single-task stages,
  * the coalesce(1) writes), so overlapping queries fills the gaps —
  * the registry crossed the wall-time budget of the driver's capture
  * step at ~430 entries (CORRECTNESS_r12/r13 arrived empty), and the
  * dump half of that budget is pure scheduling slack. Safety: Spark
  * sessions are thread-safe for concurrent actions; registry entries
  * are independent except the ModelCache trainer/serve families,
  * whose eviction race is closed by `spark.graft.cacheNoRelease`
  * (see ModelCache.put — a dump run executes each entry once, so the
  * unreleased evicted copies are bounded at one model frame per
  * family).
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional 3rd+ args: restrict to named queries (dev loop; the
    // driver always passes exactly two, dumping everything)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.speculation", "true") // stragglers; no-op in local mode
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.graft.cacheNoRelease", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val todo = SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .toSeq
    val threads = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_VERIFY_THREADS", "4").toInt)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val futures = todo.map { case (name, fn) =>
      pool.submit(new Runnable {
        def run(): Unit =
          try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          catch { case e: Throwable =>
            System.err.println(s"[verify] $name failed: ${e.getMessage}")
          }
      })
    }
    futures.foreach(_.get())
    pool.shutdown()
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
    spark.stop()
  }
}
