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

  /** TPC-H Q8: national market share — the fraction of ASIA-region
    * customers' revenue supplied by NATION_1, per order year. Two
    * independent nation lookups (customer side filtered through
    * region, supplier side kept as a grouping input) with disjoint
    * aliases; conditional aggregation computes numerator and
    * denominator in ONE pass — never two scans. Both sums round
    * before the share divides (q14's hash-stability idiom).
    */
  def q8MarketShare(s: SparkSession, d: String): DataFrame = {
    val nC = nation(s, d).select(col("n_nationkey").as("ck"), col("n_regionkey"))
    val nS = nation(s, d).select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))
    val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
    lineitem(s, d)
      .join(orders(s, d).filter(col("o_orderdate") >= tsLit("1996-01-01") &&
        col("o_orderdate") < tsLit("1998-01-01")), col("l_orderkey") === col("o_orderkey"))
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nC), col("c_nationkey") === col("ck"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .join(supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nS), col("s_nationkey") === col("sk"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        round(sum(when(col("supp_nation") === "NATION_1", rev).otherwise(lit(0.0))), 2)
          .as("nation_revenue"),
        round(sum(rev), 2).as("total_revenue"))
      .select(col("o_year"),
        round(col("nation_revenue") / col("total_revenue"), 4).as("mkt_share"),
        col("nation_revenue"), col("total_revenue"))
  }

  /** TPC-H Q11: important-part value. Per-part revenue value compared
    * against a GLOBAL scalar threshold — the scalar subquery becomes a
    * 1-row aggregate crossJoined onto the per-part frame (broadcast by
    * construction: one row). No partsupp table, so "value" proxies as
    * discounted lineitem revenue per part; the stock fixed-fraction
    * cut (0.0001/SF) is scale-dependent, so the threshold here is
    * 1.2× the MEAN part value — same plan shape, SF-invariant
    * selectivity. The compare runs on the raw sums (relative double
    * noise ~1e-16 cannot cross a 20% margin); the EMITTED value
    * rounds to cents.
    */
  def q11PartValue(s: SparkSession, d: String): DataFrame = {
    val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
    val perPart = lineitem(s, d)
      .groupBy("l_partkey").agg(sum(rev).as("raw_value"))
    val total = perPart.agg(avg(col("raw_value")).as("mean_value"))
    perPart.crossJoin(broadcast(total))
      .filter(col("raw_value") > col("mean_value") * lit(1.2))
      .select(col("l_partkey"), round(col("raw_value"), 2).as("part_value"))
  }

  /** TPC-H Q15: top supplier(s) — revenue per supplier over 1996Q1,
    * keeping every supplier whose revenue EQUALS the maximum. The
    * view+scalar-subquery form becomes one aggregation plus a 1-row
    * broadcast max (NOT an unpartitioned window — |suppliers| scales
    * with SF, and a window max would drag every supplier cell onto
    * one partition); equality is decided on the already-rounded
    * cents so "ties at max" is well-defined across engines.
    */
  def q15TopSupplier(s: SparkSession, d: String): DataFrame = {
    val rev = lineitem(s, d)
      .filter(col("l_shipdate") >= tsLit("1996-01-01") &&
        col("l_shipdate") < tsLit("1996-04-01"))
      .groupBy("l_suppkey")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("total_revenue"))
    val mx = rev.agg(max("total_revenue").as("max_rev"))
    rev.crossJoin(broadcast(mx))
      .filter(col("total_revenue") === col("max_rev"))
      .join(supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
  }

  /** TPC-H Q16: supplier diversity per part segment — distinct
    * suppliers actually shipping each (brand, type, size) cell,
    * excluding one brand, non-PROMO types, a size whitelist, and
    * "complaint" suppliers (adapted: negative account balance).
    * The exclusion list is a broadcast LEFT ANTI join (never a
    * NOT IN subquery re-scan); the distinct count shuffles once on
    * the 3-part cell key.
    */
  def q16PartsSuppliers(s: SparkSession, d: String): DataFrame = {
    val p = part(s, d)
      .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    val complaints = supplier(s, d).filter(col("s_acctbal") < 0).select("s_suppkey")
    lineitem(s, d).select("l_partkey", "l_suppkey")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(complaints), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct("l_suppkey").as("supplier_cnt"))
  }

  /** TPC-H Q18: large-volume orders — customers whose order exceeds
    * 200 total units. The HAVING pre-aggregates lineitem down to
    * qualifying orderkeys BEFORE any dimension join (the only plan
    * that survives a 100 TB fact: the group-by output is |orders|
    * rows, the filter cuts it to the tail). Quantities are integral
    * doubles, so the sum and the >200 cut are exact. Top-100 by
    * total price with a full tie-break.
    */
  def q18BigOrders(s: SparkSession, d: String): DataFrame = {
    val big = lineitem(s, d)
      .groupBy("l_orderkey")
      .agg(sum("l_quantity").as("sum_qty"))
      .filter(col("sum_qty") > 200)
    big.join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
        round(col("o_totalprice"), 2).as("totalprice"), col("sum_qty"))
      .orderBy(col("totalprice").desc, col("o_orderkey").asc)
      .limit(100)
  }

  /** TPC-H Q22: global sales opportunity — wealthy-but-inactive
    * customers per nation. "Inactive" adapts to "no order since
    * 2000-07-01" (every customer here has SOME order, unlike stock
    * TPC-H); the country-code IN-list is a nationkey set. Two scalar
    * shapes compose: a 1-row broadcast average threshold and a
    * broadcast LEFT ANTI join against the recent-actives projection
    * (distinct custkeys — at 100 TB this is the |customers|-bounded
    * side, not the order stream).
    */
  def q22GlobalBalance(s: SparkSession, d: String): DataFrame = {
    val pool = customer(s, d).filter(col("c_nationkey").isin(1, 2, 3, 4, 5))
      .select("c_custkey", "c_nationkey", "c_acctbal")
    val thr = pool.filter(col("c_acctbal") > 0)
      .agg(avg("c_acctbal").as("bal_threshold"))
    val active = orders(s, d)
      .filter(col("o_orderdate") >= tsLit("2000-07-01"))
      .select("o_custkey").distinct()
    pool.crossJoin(broadcast(thr))
      .filter(col("c_acctbal") > col("bal_threshold"))
      .join(active, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("numcust"), round(sum("c_acctbal"), 2).as("totacctbal"))
  }

  /** TPC-H Q2: minimum-cost supplier per part (size-10 segment). No
    * partsupp table, so "cost" is the supplier's observed average
    * unit price over their lineitems of that part — computed in EXACT
    * integer arithmetic (cent-quantized price sum × 10⁴ DIV integral
    * quantity sum), so the per-part argmin and its supplier tie-break
    * are deterministic. The correlated min-subquery becomes one
    * window rank over the (part, supplier) aggregate.
    */
  def q2MinCost(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p = part(s, d).filter(col("p_size") === 10).select("p_partkey")
    val cells = lineitem(s, d)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy("p_partkey", "l_suppkey")
      .agg(sum(floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long")).as("price_c"),
        sum("l_quantity").cast("long").as("qty"))
      .withColumn("cost_micro", expr("price_c * 10000 DIV qty"))
    val rankW = Window.partitionBy("p_partkey")
      .orderBy(col("cost_micro").asc, col("l_suppkey").asc)
    cells.withColumn("rn", row_number().over(rankW))
      .filter(col("rn") === 1)
      .join(supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .select(col("p_partkey"), col("s_suppkey"), col("s_name"),
        (col("cost_micro") / 1e6).as("unit_cost"))
  }

  /** TPC-H Q12: shipping-delay census. No shipmode column, so the
    * split is by line status; "late" adapts to shipped > 90 days
    * after the order date, within 1996. Conditional aggregation over
    * the fact-fact join — priority classes counted in one pass.
    */
  def q12LatePriority(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate") >= tsLit("1996-01-01") &&
        col("l_shipdate") < tsLit("1997-01-01"))
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .groupBy("l_linestatus")
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("low_line_count"))

  /** TPC-H Q20: suppliers with excess stock of a part family —
    * adapted: suppliers whose shipped 'widget' quantity exceeds 1.1×
    * the mean over suppliers (stock Q20's half-of-availqty cut needs
    * partsupp; a fixed quantity threshold would be SF-dependent).
    * One filtered join + per-supplier aggregate + a 1-row broadcast
    * mean; nation broadcast for the report columns.
    */
  def q20ExcessSuppliers(s: SparkSession, d: String): DataFrame = {
    val widgets = part(s, d).filter(col("p_name").contains("widget"))
      .select("p_partkey")
    val perSupp = lineitem(s, d)
      .join(broadcast(widgets), col("l_partkey") === col("p_partkey"))
      .groupBy("l_suppkey")
      .agg(sum("l_quantity").cast("long").as("widget_qty"))
    val mean = perSupp.agg(avg("widget_qty").as("mean_qty"))
    perSupp.crossJoin(broadcast(mean))
      .filter(col("widget_qty") > col("mean_qty") * 1.1)
      .join(supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"), col("widget_qty"))
  }

  /** TPC-H Q21: suppliers who kept orders waiting — the sole-blame
    * pattern (EXISTS a late line of mine AND NOT EXISTS another
    * supplier's late line on the same order). Re-planned without
    * correlated subqueries: one (order, supplier) aggregate with a
    * late flag, per-order supplier/late-supplier counts via a second
    * aggregate, blame = late ∧ n_late = 1 ∧ n_suppliers ≥ 2. Top 20
    * by wait count under a total order. "Late" = shipped > 60 days
    * after order date (no commit/receipt dates in this schema).
    */
  def q21WaitingSuppliers(s: SparkSession, d: String): DataFrame = {
    val os = lineitem(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey", "l_suppkey")
      .agg(max(when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"), 1)
        .otherwise(0)).as("late"))
    val perOrder = os.groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_supp"), sum("late").as("n_late"))
    os.join(perOrder, "l_orderkey")
      .filter(col("late") === 1 && col("n_late") === 1 && col("n_supp") >= 2)
      .groupBy("l_suppkey")
      .agg(count(lit(1)).as("numwait"))
      .join(supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_suppkey").asc)
      .limit(20)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q2_min_cost" -> q2MinCost,
    "q12_late_priority" -> q12LatePriority,
    "q20_excess_suppliers" -> q20ExcessSuppliers,
    "q21_waiting_suppliers" -> q21WaitingSuppliers,
    "q8_market_share" -> q8MarketShare,
    "q11_part_value" -> q11PartValue,
    "q15_top_supplier" -> q15TopSupplier,
    "q16_parts_suppliers" -> q16PartsSuppliers,
    "q18_big_orders" -> q18BigOrders,
    "q22_global_balance" -> q22GlobalBalance,
    "q4_order_priority" -> q4OrderPriority,
    "q6_forecast" -> q6Forecast,
    "q10_returned" -> q10Returned,
    "q13_custdist" -> q13CustDist,
    "q14_promo" -> q14Promo,
    "q19_discount_parts" -> q19DiscountParts)

  def oracleSql: Map[String, String] = Map(
    "q2_min_cost" ->
      """WITH cells AS (
        |  SELECT l_partkey AS p_partkey, l_suppkey,
        |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS price_c,
        |    CAST(sum(l_quantity) AS BIGINT) AS qty
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_size = 10
        |  GROUP BY 1, 2),
        |ranked AS (
        |  SELECT *, price_c * 10000 // qty AS cost_micro,
        |    row_number() OVER (PARTITION BY p_partkey
        |      ORDER BY price_c * 10000 // qty, l_suppkey) AS rn
        |  FROM cells)
        |SELECT p_partkey, s_suppkey, s_name,
        |  cost_micro / 1e6 AS unit_cost
        |FROM ranked JOIN supplier ON l_suppkey = s_suppkey
        |WHERE rn = 1""".stripMargin,
    "q12_late_priority" ->
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_shipdate > o_orderdate + INTERVAL 90 DAY
        |GROUP BY 1""".stripMargin,
    "q20_excess_suppliers" ->
      """WITH per_supp AS (
        |  SELECT l_suppkey, CAST(sum(l_quantity) AS BIGINT) AS widget_qty
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_name LIKE '%widget%'
        |  GROUP BY 1),
        |m AS (SELECT avg(widget_qty) AS mean_qty FROM per_supp)
        |SELECT s_suppkey, s_name, n_name, widget_qty
        |FROM per_supp, m
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE widget_qty > mean_qty * 1.1""".stripMargin,
    "q21_waiting_suppliers" ->
      """WITH os AS (
        |  SELECT l_orderkey, l_suppkey,
        |    max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
        |        THEN 1 ELSE 0 END) AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2),
        |per_order AS (
        |  SELECT l_orderkey, count(*) AS n_supp, sum(late) AS n_late
        |  FROM os GROUP BY 1)
        |SELECT s_suppkey, s_name, count(*) AS numwait
        |FROM os
        |JOIN per_order USING (l_orderkey)
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE late = 1 AND n_late = 1 AND n_supp >= 2
        |GROUP BY 1, 2
        |ORDER BY numwait DESC, s_suppkey ASC
        |LIMIT 20""".stripMargin,
    "q8_market_share" ->
      """WITH base AS (
        |  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |    l_extendedprice * (1 - l_discount) AS rev,
        |    ns.n_name AS supp_nation
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation nc ON c_nationkey = nc.n_nationkey
        |  JOIN region ON nc.n_regionkey = r_regionkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ns ON s_nationkey = ns.n_nationkey
        |  WHERE r_name = 'ASIA'
        |    AND o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o_orderdate < TIMESTAMP '1998-01-01'),
        |sums AS (
        |  SELECT o_year,
        |    round(sum(CASE WHEN supp_nation = 'NATION_1' THEN rev ELSE 0 END), 2)
        |      AS nation_revenue,
        |    round(sum(rev), 2) AS total_revenue
        |  FROM base GROUP BY 1)
        |SELECT o_year, round(nation_revenue / total_revenue, 4) AS mkt_share,
        |  nation_revenue, total_revenue
        |FROM sums""".stripMargin,
    "q11_part_value" ->
      """WITH per_part AS (
        |  SELECT l_partkey, sum(l_extendedprice * (1 - l_discount)) AS raw_value
        |  FROM lineitem GROUP BY 1)
        |SELECT l_partkey, round(raw_value, 2) AS part_value
        |FROM per_part
        |WHERE raw_value > (SELECT avg(raw_value) FROM per_part) * 1.2""".stripMargin,
    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)""".stripMargin,
    "q16_parts_suppliers" ->
      """SELECT p_brand, p_type, p_size,
        |  count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
        |  AND l_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3""".stripMargin,
    "q18_big_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, sum(l_quantity) AS sum_qty
        |  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 200)
        |SELECT c_custkey, c_name, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
        |  round(o_totalprice, 2) AS totalprice, sum_qty
        |FROM big
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY totalprice DESC, o_orderkey ASC
        |LIMIT 100""".stripMargin,
    "q22_global_balance" ->
      """WITH pool AS (
        |  SELECT c_custkey, c_nationkey, c_acctbal FROM customer
        |  WHERE c_nationkey IN (1, 2, 3, 4, 5)),
        |thr AS (SELECT avg(c_acctbal) AS bal_threshold FROM pool
        |        WHERE c_acctbal > 0),
        |active AS (SELECT DISTINCT o_custkey FROM orders
        |           WHERE o_orderdate >= TIMESTAMP '2000-07-01')
        |SELECT c_nationkey, count(*) AS numcust,
        |  round(sum(c_acctbal), 2) AS totacctbal
        |FROM pool, thr
        |WHERE c_acctbal > bal_threshold
        |  AND c_custkey NOT IN (SELECT o_custkey FROM active)
        |GROUP BY 1""".stripMargin,
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
