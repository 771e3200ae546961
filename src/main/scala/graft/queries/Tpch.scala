package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables._

/** Second wave of TPC-H-shaped relational heads (q1/q3/q5/q7/q9/q17
  * live in [[Relational]]). The reference engine answers none of these
  * shapes (its only query form is map→shuffle→reduce, SURVEY.md §2.3);
  * these are the canonical decision-support plans a user of a
  * relational surface expects, adapted to the driver's schema (no
  * partsupp table, single-word p_type, no shipmode/commit/receipt
  * dates — each head documents its adaptation).
  *
  * Plan-shape notes (the 100 TB contract):
  *  - date/brand/size predicates sit under the joins so they reach the
  *    parquet scan (PushedFilters) and cut join fan-in at the source;
  *  - constant-size dims (nation) broadcast; part broadcasts after its
  *    selective filter (size-capped at real scale by AQE's threshold);
  *  - EXISTS becomes a left-semi join — Spark dedups the probe side
  *    instead of materializing the subquery per row;
  *  - fact-fact joins shuffle once on the join key; every aggregate
  *    that feeds a hash compare is rounded (or integer-quantized when
  *    the sum is cancellation-prone — q9's trick, not needed here as
  *    every sum below is same-sign).
  */
object Tpch {

  private def tsLit(s: String) = lit(s).cast("timestamp")

  /** TPC-H Q4: order-priority checking. Orders placed in 1996Q3 with
    * at least one lineitem shipped more than 60 days after the order
    * date (the schema has no commit/receipt dates; "late line" is the
    * adapted existence predicate). EXISTS → left-semi join: the join
    * condition references both sides (l_shipdate > o_orderdate + 60d),
    * so Spark plans a semi hash-join on orderkey with the residual
    * date predicate — one shuffle, probe side never duplicated.
    */
  def q4OrderPriority(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
      .filter(col("o_orderdate") >= tsLit("1996-07-01") &&
        col("o_orderdate") < tsLit("1996-10-01"))
    val l = lineitem(s, d).select("l_orderkey", "l_shipdate")
    o.join(l,
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
  }

  /** TPC-H Q6: forecasting-revenue change. The canonical single-scan
    * aggregate: every predicate (shipdate year, discount band,
    * quantity cap) pushes to the parquet reader, the projection prunes
    * to 4 columns, and the global sum is a partial-agg over whatever
    * survives — at 100 TB this reads only the row groups whose
    * min/max stats overlap the filter. Discounts are discrete
    * hundredths in the data, so the double BETWEEN is exact.
    */
  def q6Forecast(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate") >= tsLit("1996-01-01") &&
        col("l_shipdate") < tsLit("1997-01-01") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"))

  /** TPC-H Q10: returned-item reporting. Top 20 customers by revenue
    * lost to returns ('R' flag) for orders placed in 1996Q4.
    * lineitem⋈orders shuffles on orderkey, the result re-shuffles on
    * custkey into customer, nation broadcasts. Total tie-break order
    * (revenue desc, custkey asc) keeps the LIMIT deterministic.
    */
  def q10Returned(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
      .filter(col("o_orderdate") >= tsLit("1996-10-01") &&
        col("o_orderdate") < tsLit("1997-01-01"))
    lineitem(s, d).filter(col("l_returnflag") === "R")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(20)
  }

  /** TPC-H Q13: customer order-count distribution. LEFT join so
    * zero-order customers survive with c_count = 0, then a second
    * aggregation over the counts. The comment-pattern exclusion is
    * adapted to priority ('1-URGENT' orders don't count). Two
    * shuffles by construction: custkey for the count, c_count for the
    * histogram — the second input is |customers| rows of two ints.
    */
  def q13CustDist(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d).filter(col("o_orderpriority") =!= "1-URGENT")
      .select("o_custkey", "o_orderkey")
    customer(s, d).select("c_custkey")
      .join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
  }

  /** TPC-H Q14: promotion effect — the share of one month's revenue
    * from PROMO-type parts (single-word p_type in this schema).
    * Conditional aggregation over one lineitem⋈part join; the month
    * filter pushes to the fact scan, part broadcasts. The ratio is
    * computed from the two already-rounded sums so the hash compare
    * sees a stable quotient.
    */
  def q14Promo(s: SparkSession, d: String): DataFrame = {
    val p = part(s, d).select("p_partkey", "p_type")
    val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
    lineitem(s, d)
      .filter(col("l_shipdate") >= tsLit("1996-09-01") &&
        col("l_shipdate") < tsLit("1996-10-01"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .agg(
        round(sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0))), 2)
          .as("promo_revenue"),
        round(sum(rev), 2).as("total_revenue"))
      .select(
        round(col("promo_revenue") * 100 / col("total_revenue"), 4).as("promo_pct"),
        col("promo_revenue"), col("total_revenue"))
  }

  /** TPC-H Q19: discounted revenue under a disjunction of
    * brand/size/quantity bands. The OR-of-ANDs references both join
    * sides, but each disjunct's single-side conjuncts are extracted by
    * Catalyst (CNF conversion) so the scans still prune: lineitem
    * reads only quantity 1..30, part only size 1..35. The join itself
    * stays a broadcast hash join on partkey with the disjunction as a
    * residual — never a cartesian.
    */
  def q19DiscountParts(s: SparkSession, d: String): DataFrame = {
    val p = part(s, d).select("p_partkey", "p_brand", "p_size")
    val band = (brand: String, sizeHi: Int, qtyLo: Int, qtyHi: Int) =>
      col("p_brand") === brand && col("p_size").between(1, sizeHi) &&
        col("l_quantity").between(qtyLo, qtyHi)
    lineitem(s, d)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(band("Brand#12", 15, 1, 11) || band("Brand#23", 25, 10, 20) ||
        band("Brand#14", 35, 20, 30))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q4_order_priority" -> q4OrderPriority,
    "q6_forecast" -> q6Forecast,
    "q10_returned" -> q10Returned,
    "q13_custdist" -> q13CustDist,
    "q14_promo" -> q14Promo,
    "q19_discount_parts" -> q19DiscountParts)

  def oracleSql: Map[String, String] = Map(
    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01'
        |  AND o_orderdate < TIMESTAMP '1996-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY 1""".stripMargin,
    "q6_forecast" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q10_returned" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-10-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1, 2, 3, 4
        |ORDER BY revenue DESC, c_custkey ASC
        |LIMIT 20""".stripMargin,
    "q13_custdist" ->
      """WITH per_cust AS (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer
        |  LEFT JOIN (SELECT o_custkey, o_orderkey FROM orders
        |             WHERE o_orderpriority <> '1-URGENT') o
        |    ON c_custkey = o_custkey
        |  GROUP BY 1)
        |SELECT c_count, count(*) AS custdist FROM per_cust GROUP BY 1""".stripMargin,
    "q14_promo" ->
      """WITH sums AS (
        |  SELECT
        |    round(sum(CASE WHEN p_type = 'PROMO'
        |      THEN l_extendedprice * (1 - l_discount) ELSE 0 END), 2)
        |      AS promo_revenue,
        |    round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-09-01'
        |    AND l_shipdate < TIMESTAMP '1996-10-01')
        |SELECT round(promo_revenue * 100 / total_revenue, 4) AS promo_pct,
        |  promo_revenue, total_revenue
        |FROM sums""".stripMargin,
    "q19_discount_parts" ->
      """SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 35
        |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin)
}
