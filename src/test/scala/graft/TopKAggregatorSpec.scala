package graft

import graft.queries.{Advanced, Relational}

/** Typed bounded-buffer top-k: results must equal the window form, and
  * the plan must run it as partial+final aggregation (the map-side
  * merge is the point — the reference's reduce is final-only,
  * SURVEY.md §4.2).
  */
class TopKAggregatorSpec extends SparkSuite {

  test("topk_agg equals the row_number window form") {
    val agg = Advanced.topkAgg(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val win = Relational.topkPerGroup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(agg === win)
  }

  test("aggregation is two-phase (partial merge before the shuffle)") {
    val plan = Advanced.topkAgg(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("partial_topkaggregator") ||
      plan.split("ObjectHashAggregate|SortAggregate").length > 2,
      s"expected partial+final aggregate phases:\n$plan")
  }
}
