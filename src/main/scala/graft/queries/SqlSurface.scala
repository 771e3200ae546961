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

  /** Second wave of the verbatim surface: the dialect-clean TPC-H
    * heads (q1/q4/q6/q12/q14/q17 class), each ONE string shipped to
    * both engines. Conventions that keep the shared text exact:
    * money terms floor-quantized to int64 cents INSIDE the SQL
    * (integer sums are merge-order independent in both engines;
    * DuckDB's HUGEINT sums CAST back to BIGINT), TIMESTAMP literals
    * (the parquet date columns are timestamps), and filter windows
    * that match the generated 1995–2001 data. l_quantity is
    * integral-valued, so its double avg is an exact-integer-sum
    * divide — identical IEEE in both engines (q17's correlated
    * threshold).
    */
  val PortableSql2: Map[String, String] = Map(
    "sql_q1_verbatim" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |    AS sum_qty_c,
        |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
        |    AS BIGINT) AS sum_base_c,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax)
        |    * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_charge_c,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "sql_q4_verbatim" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_quantity > 45)
        |GROUP BY o_orderpriority""".stripMargin,
    "sql_q6_verbatim" ->
      """SELECT CAST(sum(CAST(floor(l_extendedprice * l_discount * 100 + 0.5)
        |  AS BIGINT)) AS BIGINT) AS revenue_c
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,
    "sql_q12_verbatim" ->
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
        |                  OR o_orderpriority = '2-HIGH'
        |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority <> '1-URGENT'
        |                 AND o_orderpriority <> '2-HIGH'
        |                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY l_linestatus""".stripMargin,
    "sql_q14_verbatim" ->
      """SELECT 100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
        |      AS BIGINT) ELSE 0 END) AS DOUBLE)
        |  / CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100
        |      + 0.5) AS BIGINT)) AS DOUBLE) AS promo_share
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'""".stripMargin,
    "sql_q3_verbatim" ->
      """SELECT l_orderkey,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100
        |    + 0.5) AS BIGINT)) AS BIGINT) AS revenue_c,
        |  o_orderdate
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1996-06-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1996-06-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue_c DESC, l_orderkey ASC
        |LIMIT 10""".stripMargin,
    "sql_q5_verbatim" ->
      """SELECT n_name,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100
        |    + 0.5) AS BIGINT)) AS BIGINT) AS revenue_c
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name""".stripMargin,
    "sql_q10_verbatim" ->
      """SELECT c_custkey, c_name,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100
        |    + 0.5) AS BIGINT)) AS BIGINT) AS revenue_c,
        |  n_name
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue_c DESC, c_custkey ASC
        |LIMIT 20""".stripMargin,
    "sql_q19_verbatim" ->
      """SELECT CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100
        |  + 0.5) AS BIGINT)) AS BIGINT) AS revenue_c
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#11' AND p_size >= 1 AND p_size <= 15
        |       AND l_quantity >= 1 AND l_quantity <= 11)
        |   OR (p_brand = 'Brand#12' AND p_size >= 1 AND p_size <= 25
        |       AND l_quantity >= 10 AND l_quantity <= 20)
        |   OR (p_brand = 'Brand#13' AND p_size >= 1 AND p_size <= 35
        |       AND l_quantity >= 20 AND l_quantity <= 30)""".stripMargin,
    "sql_q17_verbatim" ->
      """SELECT CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
        |  AS BIGINT) AS small_qty_rev_c
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE p.p_size = 1
        |  AND l.l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
        |                      FROM lineitem l2
        |                      WHERE l2.l_partkey = l.l_partkey)""".stripMargin)

  private val AllTables: Seq[(String, (SparkSession, String) => DataFrame)] =
    Seq("lineitem" -> (Tables.lineitem _), "orders" -> (Tables.orders _),
      "part" -> (Tables.part _), "customer" -> (Tables.customer _),
      "supplier" -> (Tables.supplier _), "nation" -> (Tables.nation _),
      "region" -> (Tables.region _))

  private def runVerbatim(sql: String)(s: SparkSession, d: String): DataFrame = {
    // register only the views the statement references — each
    // registration re-reads the parquet footer, and paying 7 of them
    // per execution for a 1-table statement is measurable bench noise
    AllTables.foreach { case (n, f) =>
      if (java.util.regex.Pattern.compile("\\b" + n + "\\b").matcher(sql).find())
        f(s, d).createOrReplaceTempView(n)
    }
    s.sql(sql)
  }

  def sqlSurface(s: SparkSession, d: String): DataFrame =
    runVerbatim(PortableSql)(s, d)

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("sql_surface" -> (sqlSurface _)) ++
      PortableSql2.map { case (n, sql) => n -> (runVerbatim(sql) _) }

  def oracleSql: Map[String, String] =
    Map("sql_surface" -> PortableSql) ++ PortableSql2
}
