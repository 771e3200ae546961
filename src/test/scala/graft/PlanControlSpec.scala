package graft

import org.apache.spark.sql.functions._

/** Physical-plan control a performance engineer needs at 100 TB:
  * join-strategy hints override the planner's size heuristics (forcing
  * SHJ on a huge-but-uniform side, SMJ when both sides are sorted
  * output of prior stages), and REBALANCE fixes output-file sizing
  * before a write. Results must be hint-invariant — only the plan moves.
  */
class PlanControlSpec extends SparkSuite {
  import spark.implicits._

  private lazy val orders = graft.core.Tables.orders(spark, sfDir)
  private lazy val customer = graft.core.Tables.customer(spark, sfDir)

  private def joined(hint: String) = {
    val c = if (hint.isEmpty) customer else customer.hint(hint)
    orders.join(c, col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
  }

  private def execPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // AQE finalizes the plan only after execution
    df.queryExecution.executedPlan.toString
  }

  test("join hints select BHJ / SMJ / SHJ; results are identical") {
    val base = joined("broadcast").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val plans = Map(
      "broadcast" -> "BroadcastHashJoin",
      "merge" -> "SortMergeJoin",
      "shuffle_hash" -> "ShuffledHashJoin")
    plans.foreach { case (hint, op) =>
      val df = joined(hint)
      assert(execPlan(df).contains(op), s"hint $hint must plan $op")
      assert(df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap === base)
    }
  }

  test("AQE coalesces undersized shuffle partitions at runtime") {
    // 64 configured shuffle partitions on KB of data → AQE merges the
    // post-shuffle reads; at scale this removes task-launch overhead
    // for filters that shrink a stage's output unpredictably.
    val saved = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "64")
      val df = orders.groupBy("o_orderstatus")
        .agg(org.apache.spark.sql.functions.sum("o_totalprice"))
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("AQEShuffleRead") && plan.contains("coalesced"),
        s"expected runtime-coalesced shuffle read:\n$plan")
    } finally spark.conf.set("spark.sql.shuffle.partitions", saved)
  }

  test("REBALANCE hint inserts a rebalance exchange for write sizing") {
    val df = orders.select("o_orderkey", "o_totalprice")
      .hint("rebalance")
    assert(df.queryExecution.optimizedPlan.toString.contains("RebalancePartitions"))
    assert(df.count() === orders.count())
  }
}
