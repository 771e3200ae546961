package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.Tables

/** The SQL-text entry point: the ONE query string below runs
  * VERBATIM through both `spark.sql` (over temp views of the parquet
  * tables) and the driver's DuckDB oracle — no dialect translation at
  * all. This is the surface a reference user who writes SQL (not
  * DataFrames) actually touches, and shipping the identical string to
  * both engines makes the oracle gate a truly independent check of
  * the SQL front end (parser → analyzer → optimizer → execution), not
  * just of a hand-paired translation.
  *
  * The statement exercises a CTE, an int64-cent-quantized aggregate
  * (portable determinism: floor/CAST are ANSI), a fact-fact join, and
  * a second aggregation — written in the ANSI subset both engines
  * parse identically.
  */
object SqlSurface {

  /** Shared verbatim: revenue per order (cents), rolled up by order
    * priority.
    */
  val PortableSql: String =
    """WITH rev AS (
      |  SELECT l_orderkey,
      |    CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
      |      AS BIGINT)) AS BIGINT) AS rev_c
      |  FROM lineitem GROUP BY l_orderkey)
      |SELECT o_orderpriority, count(*) AS n_orders,
      |  CAST(sum(rev_c) AS DOUBLE) / CAST(100 AS DOUBLE) AS total_rev
      |FROM orders JOIN rev ON o_orderkey = l_orderkey
      |GROUP BY o_orderpriority""".stripMargin

  def sqlSurface(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
    Tables.orders(s, d).createOrReplaceTempView("orders")
    s.sql(PortableSql)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sql_surface" -> sqlSurface)

  def oracleSql: Map[String, String] = Map(
    "sql_surface" -> PortableSql)
}
