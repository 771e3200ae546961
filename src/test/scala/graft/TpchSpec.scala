package graft

import graft.queries.Tpch

/** Plan + semantics contracts for the second-wave TPC-H heads. The
  * value correctness lives under the driver's DuckDB oracle; these
  * assert the SCALE contract (pushdown, semi-join shape, broadcast)
  * and the adapted predicates' edge semantics.
  */
class TpchSpec extends SparkSuite {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q6: all three predicates push to the parquet scan; 4-column read") {
    // toString truncates PushedFilters — use formatted explain (full list)
    val plan = Tpch.q6Forecast(spark, sfDir).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("GreaterThanOrEqual(l_shipdate"), s"shipdate lower bound not pushed:\n$plan")
    assert(plan.contains("GreaterThanOrEqual(l_discount"), s"discount band not pushed:\n$plan")
    assert(plan.contains("LessThan(l_quantity"), s"quantity cap not pushed:\n$plan")
    assert(!plan.contains("l_orderkey"), s"unused columns not pruned:\n$plan")
  }

  test("q4: EXISTS plans as a left-semi join, no row duplication") {
    val plan = planOf(Tpch.q4OrderPriority(spark, sfDir))
    assert(plan.contains("LeftSemi"), s"expected left-semi join:\n$plan")
    // the residual both-sides date predicate must ride the join, not a
    // post-join filter (there is no post-join lineitem column to filter on)
    assert(!plan.contains("LeftOuter"), plan)
  }

  test("q4: an order with ONLY on-time lines is excluded") {
    val rows = Tpch.q4OrderPriority(spark, sfDir)
    val total = rows.agg(org.apache.spark.sql.functions.sum("order_count"))
      .collect()(0).getLong(0)
    // semi-join: count must be <= the plain date-window order count
    val window = graft.core.Tables.orders(spark, sfDir)
      .filter("o_orderdate >= timestamp'1996-07-01' and o_orderdate < timestamp'1996-10-01'")
      .count()
    assert(total > 0 && total < window,
      s"semi-join had no selectivity: $total of $window")
  }

  test("q19: disjunctive predicate keeps a broadcast hash join (no BNLJ/cartesian)") {
    val plan = planOf(Tpch.q19DiscountParts(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast hash join:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"disjunction degenerated to a non-equi join:\n$plan")
  }

  test("q13: zero-order customers appear in the c_count=0 bucket") {
    import org.apache.spark.sql.functions._
    val dist = Tpch.q13CustDist(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nCust = graft.core.Tables.customer(spark, sfDir).count()
    assert(dist.values.sum === nCust, "histogram must partition all customers")
    // sf0.001 has fewer orders than customers*avg → some zero bucket
    val withOrders = graft.core.Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select("o_custkey").distinct().count()
    assert(dist.getOrElse(0L, 0L) === nCust - withOrders)
  }

  test("q14: promo share is consistent with its two component sums") {
    val r = Tpch.q14Promo(spark, sfDir).collect()(0)
    val (pct, promo, total) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    assert(promo >= 0 && promo <= total)
    assert(math.abs(pct - promo * 100 / total) < 1e-4)
  }

  test("q10: limit 20 with total tie-break order; revenue descending") {
    val rows = Tpch.q10Returned(spark, sfDir).collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b }, "not sorted")
  }
}
