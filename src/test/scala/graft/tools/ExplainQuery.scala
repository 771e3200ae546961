package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness: print the formatted physical plan of one registered
  * query on a SF dir (plan-shape audits: exchange counts, pushdown,
  * codegen spans). Usage: runMain graft.tools.ExplainQuery <name> [sfDir]
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    println(s"=== $name ===")
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
  }
}
