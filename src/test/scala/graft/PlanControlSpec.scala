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

  /** AQE's executedPlan string echoes the pre-adaptive plan under
    * "== Initial Plan ==" — strip it so Exchange counts reflect what
    * actually ran.
    */
  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    val i = s.indexOf("== Initial Plan ==")
    if (i >= 0) s.substring(0, i) else s
  }

  test("zorder_bucket: z_value is a map-side project; one partial-agg'd shuffle") {
    val plan = finalPlan(graft.queries.Sharding.zorderBucket(spark, sfDir))
    // exactly one exchange: the groupBy(bucket); assignment never shuffles
    assert(plan.split("Exchange").length - 1 === 1, s"plan:\n$plan")
    assert(!plan.contains("Join"), s"z assignment must be join-free:\n$plan")
  }

  test("bm25_terms: rank window reuses the doc_id exchange; top-k is pushed down") {
    val plan = finalPlan(graft.queries.TextOps.bm25Terms(spark, sfDir))
    // 4 shuffle exchanges ran: tf groupBy, 1-row stats agg, term
    // window, doc window (the stats BROADCAST exchange doesn't move
    // corpus data). The rank window (same doc_id partitioning as dl)
    // must NOT re-exchange — a 5th shuffle means the reuse broke.
    val n = plan.split("Exchange").length - 1 -
      (plan.split("BroadcastExchange").length - 1)
    assert(n <= 4, s"expected <=4 shuffle exchanges, got $n:\n$plan")
    // rk <= 3 compiles to WindowGroupLimit: per-partition top-k prune
    // before the final window — the bounded form of the rank filter
    assert(plan.contains("WindowGroupLimit"), s"plan:\n$plan")
  }

  test("drift_psi: corpus-sized work ends at the (source,bucket) count") {
    val df = graft.queries.Corpus.driftPsi(spark, sfDir)
    val plan = df.queryExecution.optimizedPlan.toString
    // every documents scan must reach an Aggregate before any Join or
    // Window touches it: walk each scan's ancestor chain (nearest
    // preceding line of strictly smaller tree depth) and assert the
    // first guard node is the Aggregate, i.e. windows/joins only ever
    // see (source,bucket) cells, never corpus-sized rows
    val lines = plan.split("\n")
    def depth(l: String): Int = l.indexOf("- ") match {
      case -1 => 0; case i => i / 3 + 1
    }
    def node(l: String): String = l.dropWhile(c => !c.isLetter)
    val scans = lines.zipWithIndex.filter(_._1.contains("Relation"))
    assert(scans.nonEmpty, plan)
    scans.foreach { case (l, idx) =>
      var d = depth(l)
      var i = idx - 1
      var guard: Option[String] = None
      while (i >= 0 && guard.isEmpty) {
        val di = depth(lines(i))
        if (di < d) {
          d = di
          val n = node(lines(i))
          if (n.startsWith("Aggregate") || n.startsWith("Join") ||
            n.startsWith("Window")) guard = Some(n)
        }
        i -= 1
      }
      assert(guard.exists(_.startsWith("Aggregate")),
        s"scan at line $idx reaches ${guard.getOrElse("nothing")} before an Aggregate:\n$plan")
    }
  }

  test("quantile_sketch: one partial-agg'd shuffle, join-free") {
    val plan = finalPlan(graft.queries.Sketches.quantileSketch(spark, sfDir))
    // the typed aggregator partial-aggregates map-side; the only
    // exchange carries O(k)-sized sketch buffers per source
    assert(plan.split("Exchange").length - 1 === 1, s"plan:\n$plan")
    assert(!plan.contains("Join"), s"sketch must be join-free:\n$plan")
  }

  test("events_ewma: hourly partial-agg then one window pass, join-free") {
    val plan = finalPlan(graft.queries.EventOps.eventsEwma(spark, sfDir))
    // exchange 1: (event_type, hour) groupBy; exchange 2: event_type
    // window partitioning. The 24-term lag chain must stay inside ONE
    // Window node — 24 separate windows would mean 24 sort passes.
    assert(plan.split("Exchange").length - 1 <= 2, s"plan:\n$plan")
    assert(plan.split("Window").length - 1 <= 2, s"lag chain split across windows:\n$plan")
    assert(!plan.contains("Join"), s"smoother must be join-free:\n$plan")
  }

  test("heavy_hitters_mg: candidate stage aggregates to a single object row, verify join is broadcast") {
    val df = graft.queries.Sketches.heavyHittersMg(spark, sfDir)
    val plan = execPlan(df)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"verify pass must broadcast the candidate set:\n$plan")
  }

  test("text_normalize is a pure map: zero exchanges, native expr in codegen span") {
    val plan = finalPlan(graft.queries.TextOps.textNormalize(spark, sfDir))
    assert(!plan.contains("Exchange"), s"normalize must not shuffle:\n$plan")
    assert(plan.contains("nfc_normalize"), s"native expression missing:\n$plan")
    // "*(n)" prefixes are WholeStageCodegen stages in this rendering
    assert(plan.contains("*(1) Project"), s"must stay codegen'd:\n$plan")
  }

  test("hilbert_bucket: one aggregation exchange, hilbert_value inside the scan projection") {
    val plan = finalPlan(graft.queries.Sharding.hilbertBucket(spark, sfDir))
    assert(plan.split("Exchange").length - 1 <= 1, s"layout census is one shuffle:\n$plan")
    assert(plan.contains("hilbert_value"), s"native expression missing:\n$plan")
    assert(!plan.contains("Join"), s"census must be join-free:\n$plan")
  }

  test("dedup_incremental_bloom: probe split feeds only maybes to the exact anti-join") {
    // the probe itself runs inside the .stable'd (checkpointed) frame —
    // BloomSpec certifies its codegen; here we guard the downstream
    // shape: the NOT-maybe branch bypasses the join entirely and only
    // the maybe branch reaches the LeftAnti verify.
    val df = graft.queries.Dedup.dedupIncrementalBloom(spark, sfDir)
    val plan = execPlan(df)
    assert(plan.contains("NOT maybe"), s"bloom-negative bypass branch missing:\n$plan")
    assert(plan.contains("LeftAnti"), s"exact anti-join verify missing:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"plan:\n$plan")
  }
}
