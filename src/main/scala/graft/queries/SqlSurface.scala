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
        |                      WHERE l2.l_partkey = l.l_partkey)""".stripMargin,
    // Third wave — the REMAINING 12 heads, completing all 22 TPC-H
    // query shapes as ONE dialect-shared string each. New portability
    // conventions proven here: `avg(BIGINT)` scalar-subquery
    // thresholds (exact — integer partial sums below 2^53 make the
    // double division identical IEEE in both engines), `NOT IN`
    // null-aware anti joins over non-null keys, qualified self-join
    // aliases (nation ns/nc), `year()` normalized via CAST( AS
    // INTEGER) (DuckDB returns BIGINT, Spark INT), and
    // `+ INTERVAL 60 DAY` timestamp arithmetic (identical literal
    // grammar both engines).
    "sql_q2_verbatim" ->
      """WITH cells AS (
        |  SELECT l_partkey, l_suppkey,
        |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS price_c,
        |    CAST(sum(l_quantity) AS BIGINT) AS qty
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_size = 10
        |  GROUP BY l_partkey, l_suppkey),
        |costs AS (
        |  SELECT l_partkey, l_suppkey,
        |    CAST(floor(price_c * 10000.0 / qty) AS BIGINT) AS cost_micro
        |  FROM cells),
        |best AS (
        |  SELECT l_partkey, min(cost_micro) AS best_micro FROM costs
        |  GROUP BY l_partkey),
        |pick AS (
        |  SELECT c.l_partkey AS p_partkey, min(c.l_suppkey) AS pick_suppkey,
        |    b.best_micro
        |  FROM costs c JOIN best b
        |    ON c.l_partkey = b.l_partkey AND c.cost_micro = b.best_micro
        |  GROUP BY c.l_partkey, b.best_micro)
        |SELECT p_partkey, s_suppkey, s_name, best_micro
        |FROM pick JOIN supplier ON pick_suppkey = s_suppkey
        |ORDER BY best_micro ASC, p_partkey ASC
        |LIMIT 100""".stripMargin,
    "sql_q7_verbatim" ->
      """SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS INTEGER) AS l_year,
        |  CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
        |    AS BIGINT)) AS BIGINT) AS revenue_c
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ns ON s_nationkey = ns.n_nationkey
        |JOIN nation nc ON c_nationkey = nc.n_nationkey
        |WHERE ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
        |    OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
        |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY ns.n_name, nc.n_name, CAST(year(l_shipdate) AS INTEGER)""".stripMargin,
    "sql_q8_verbatim" ->
      """WITH base AS (
        |  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |    CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)
        |      AS rev_c,
        |    ns.n_name AS supp_nation
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation nc ON c_nationkey = nc.n_nationkey
        |  JOIN region ON nc.n_regionkey = r_regionkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ns ON s_nationkey = ns.n_nationkey
        |  WHERE r_name = 'ASIA'
        |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
        |SELECT o_year,
        |  CAST(sum(CASE WHEN supp_nation = 'NATION_1' THEN rev_c ELSE 0 END)
        |    AS BIGINT) AS nation_rev_c,
        |  CAST(sum(rev_c) AS BIGINT) AS total_rev_c,
        |  CAST(floor(CAST(sum(CASE WHEN supp_nation = 'NATION_1' THEN rev_c
        |      ELSE 0 END) AS DOUBLE) / CAST(sum(rev_c) AS DOUBLE) * 10000 + 0.5)
        |    AS BIGINT) AS mkt_share_bp
        |FROM base GROUP BY o_year""".stripMargin,
    "sql_q9_verbatim" ->
      """SELECT n_name AS nation,
        |  CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |  CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)
        |    - p_retailprice * 0.8 * l_quantity) * 1000000.0 + 0.5) AS BIGINT))
        |    AS BIGINT) AS profit_micro
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%widget%'
        |GROUP BY n_name, CAST(year(o_orderdate) AS INTEGER)""".stripMargin,
    "sql_q11_verbatim" ->
      """WITH per_part AS (
        |  SELECT l_partkey,
        |    CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
        |      AS BIGINT)) AS BIGINT) AS value_c
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT l_partkey AS p_partkey, value_c
        |FROM per_part
        |WHERE value_c > (SELECT avg(value_c) * 1.2 FROM per_part)
        |ORDER BY value_c DESC, p_partkey ASC""".stripMargin,
    "sql_q13_verbatim" ->
      """WITH per_cust AS (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |SELECT c_count, count(*) AS custdist
        |FROM per_cust
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "sql_q15_verbatim" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
        |      AS BIGINT)) AS BIGINT) AS total_rev_c
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_rev_c
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_rev_c = (SELECT max(total_rev_c) FROM rev)""".stripMargin,
    "sql_q16_verbatim" ->
      """SELECT p_brand, p_type, p_size,
        |  count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
        |  AND l_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC""".stripMargin,
    "sql_q18_verbatim" ->
      """WITH big AS (
        |  SELECT l_orderkey, CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 200)
        |SELECT c_custkey, c_name, o_orderkey, o_orderdate,
        |  CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS totalprice_c, sum_qty
        |FROM big JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY totalprice_c DESC, o_orderkey ASC
        |LIMIT 100""".stripMargin,
    "sql_q20_verbatim" ->
      """WITH per_supp AS (
        |  SELECT l_suppkey, CAST(sum(l_quantity) AS BIGINT) AS widget_qty
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_name LIKE '%widget%'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, n_name, widget_qty
        |FROM per_supp
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE widget_qty > (SELECT avg(widget_qty) * 1.1 FROM per_supp)
        |ORDER BY widget_qty DESC, s_suppkey ASC""".stripMargin,
    "sql_q21_verbatim" ->
      """WITH os AS (
        |  SELECT l_orderkey, l_suppkey,
        |    max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
        |        THEN 1 ELSE 0 END) AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY l_orderkey, l_suppkey),
        |per_order AS (
        |  SELECT l_orderkey, count(*) AS n_supp,
        |    CAST(sum(late) AS BIGINT) AS n_late
        |  FROM os GROUP BY l_orderkey)
        |SELECT s_suppkey, s_name, count(*) AS numwait
        |FROM os
        |JOIN per_order ON os.l_orderkey = per_order.l_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE late = 1 AND n_late = 1 AND n_supp >= 2
        |GROUP BY s_suppkey, s_name
        |ORDER BY numwait DESC, s_suppkey ASC
        |LIMIT 20""".stripMargin,
    "sql_q22_verbatim" ->
      """WITH pool AS (
        |  SELECT c_custkey, c_nationkey,
        |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_c
        |  FROM customer
        |  WHERE c_nationkey IN (1, 2, 3, 4, 5)),
        |thr AS (SELECT avg(acctbal_c) AS bal_thr_c FROM pool WHERE acctbal_c > 0)
        |SELECT c_nationkey, count(*) AS numcust,
        |  CAST(sum(acctbal_c) AS BIGINT) AS totacctbal_c
        |FROM pool
        |WHERE acctbal_c > (SELECT bal_thr_c FROM thr)
        |  AND c_custkey NOT IN (SELECT o_custkey FROM orders
        |                        WHERE o_orderdate >= TIMESTAMP '2000-07-01 00:00:00')
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey ASC""".stripMargin)

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
