package graft

import org.apache.spark.sql.functions._
import graft.plans.AsofJoin
import graft.queries.Temporal

/** The custom as-of join physical operator: planted-shape semantics
  * (no-match nulls, equal-ts inclusion, key isolation, candidate
  * supersession), equality with the union+window formulation on real
  * data, and the plan contract (AsofJoinExec node, SMJ-shaped
  * exchanges+sorts, no Window / BNLJ / union).
  */
class AsofExecSpec extends SparkSuite {
  import spark.implicits._

  test("planted shapes: latest at-or-before per key, nulls when no prior row") {
    val trades = Seq(
      (1L, 100L, "t1"), (1L, 200L, "t2"), (1L, 50L, "t0"),
      (2L, 100L, "t3"), // user 2 has no quotes at all
      (3L, 100L, "t4")  // user 3's quotes are all later
    ).toDF("k", "ts", "trade")
    val quotes = Seq(
      (1L, 60L, "q60"), (1L, 100L, "q100"), (1L, 150L, "q150"),
      (3L, 500L, "qlate")
    ).toDF("qk", "qts", "quote")
    val got = AsofJoin.asof(trades, quotes, "k", "qk", "ts", "qts")
      .select("k", "ts", "trade", "quote")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) null else r.getString(3))).toSet
    assert(got === Set(
      (1L, 50L, "t0", null),      // before any quote
      (1L, 100L, "t1", "q100"),   // equal ts matches (at-or-before)
      (1L, 200L, "t2", "q150"),   // latest prior, superseding q60/q100
      (2L, 100L, "t3", null),     // key with no right rows
      (3L, 100L, "t4", null)))    // right rows exist but all later
  }

  test("join_asof_exec ≡ join_asof (union+window form) on sf0.001") {
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map { r =>
        (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4))
      }.toSet
    val window = canon(Temporal.joinAsof(spark, sfDir))
    val exec = canon(Temporal.joinAsofExec(spark, sfDir))
    assert(exec === window)
    assert(exec.nonEmpty)
  }

  test("forward direction: earliest at-or-after per key; nulls when none follows") {
    val trades = Seq(
      (1L, 50L, "t0"), (1L, 100L, "t1"), (1L, 200L, "t2"),
      (2L, 100L, "t3"), (3L, 100L, "t4")
    ).toDF("k", "ts", "trade")
    val quotes = Seq(
      (1L, 60L, "q60"), (1L, 100L, "q100"), (1L, 150L, "q150"),
      (3L, 500L, "qlate")
    ).toDF("qk", "qts", "quote")
    val got = AsofJoin.asof(trades, quotes, "k", "qk", "ts", "qts", forward = true)
      .select("k", "ts", "trade", "quote")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) null else r.getString(3))).toSet
    assert(got === Set(
      (1L, 50L, "t0", "q60"),     // earliest at-or-after
      (1L, 100L, "t1", "q100"),   // equal ts matches
      (1L, 200L, "t2", null),     // nothing follows for this key
      (2L, 100L, "t3", null),     // key with no right rows
      (3L, 100L, "t4", "qlate")))
  }

  test("bucketed inputs elide the exchanges: co-located as-of, same result") {
    val trades = Seq.tabulate(100)(i => (i.toLong % 7, i.toLong * 10, s"t$i"))
      .toDF("k", "ts", "trade")
    val quotes = Seq.tabulate(50)(i => (i.toLong % 7, i.toLong * 21, s"q$i"))
      .toDF("qk", "qts", "quote")
    def write(name: String, df: org.apache.spark.sql.DataFrame,
        key: String, ts: String): Unit =
      if (!spark.catalog.tableExists(name)) {
        val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
        val stale = new java.io.File(s"$wh/$name")
        if (stale.exists()) {
          def rm(f: java.io.File): Unit = {
            Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
          }
          rm(stale)
        }
        df.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .bucketBy(4, key).sortBy(key, ts).saveAsTable(name)
      }
    write("asof_left_bkt", trades, "k", "ts")
    write("asof_right_bkt", quotes, "qk", "qts")
    val df = graft.plans.AsofJoin.asof(
      spark.table("asof_left_bkt"), spark.table("asof_right_bkt"),
      "k", "qk", "ts", "qts")
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(5)) null else r.getString(5))).toSet
    val plan = df.queryExecution.executedPlan.toString
    val idx = plan.indexOf("AsofJoin")
    assert(idx >= 0, plan)
    assert(!plan.substring(idx).contains("Exchange"),
      s"bucketed as-of must read co-located buckets, not shuffle:\n$plan")
    // identical relation to the unbucketed path (which does shuffle)
    val plain = graft.plans.AsofJoin.asof(trades, quotes, "k", "qk", "ts", "qts")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(5)) null else r.getString(5))).toSet
    assert(got === plain)
    assert(got.nonEmpty)
  }

  test("plan contract: AsofJoinExec with SMJ-shaped requirements, no Window/union/BNLJ") {
    val df = Temporal.joinAsofExec(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), s"custom exec missing:\n$plan") // nodeName strips Exec
    assert(!plan.contains("Window"), s"window crept back in:\n$plan")
    assert(!plan.contains("Union"), s"union crept back in:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"BNLJ:\n$plan")
    // EnsureRequirements supplied per-side exchanges and (key, ts) sorts
    assert(plan.split("Exchange").length - 1 >= 2, s"expected both sides shuffled:\n$plan")
    assert(plan.split("Sort ").length - 1 >= 2, s"expected both sides sorted:\n$plan")
  }
}
