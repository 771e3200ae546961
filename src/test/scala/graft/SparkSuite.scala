package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM — getOrCreate reuses
  * the context). `local[4, 2]` enables one task retry so the fault
  * tests can exercise Spark's re-execution (the reference's straggler
  * re-queue analog, master.go:111-127).
  */
object SparkSuite {
  lazy val session: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    // F11: backup tasks on a cluster; local mode accepts-and-ignores it
    // (TaskSchedulerImpl only starts the speculation thread when !isLocal)
    .config("spark.speculation", "true")
    // static conf — must be on the context that backs every session
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
    .getOrCreate()
}

trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSuite.session
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sfDir = "/root/testdata/sf0.001"
}
