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

  test("tolerance: stale candidates beyond the bound emit nulls, fresh ones match") {
    val trades = Seq(
      (1L, 100L, "t1"),  // q90 is 10 old → within tol 50
      (1L, 200L, "t2"),  // q90 is 110 old → too stale
      (1L, 300L, "t3")   // q260 is 40 old → within
    ).toDF("k", "ts", "trade")
    val quotes = Seq((1L, 90L, "q90"), (1L, 260L, "q260")).toDF("qk", "qts", "quote")
    val got = AsofJoin.asof(trades, quotes, "k", "qk", "ts", "qts",
        tolerance = Some(50L))
      .select("k", "ts", "trade", "quote")
      .collect().map(r => (r.getLong(1), Option(r.getString(3)).orNull)).toMap
    assert(got === Map(100L -> "q90", 200L -> null, 300L -> "q260"))
    // forward direction: next quote must be within the bound too
    val fwd = AsofJoin.asof(trades, quotes, "k", "qk", "ts", "qts",
        forward = true, tolerance = Some(50L))
      .select("k", "ts", "trade", "quote")
      .collect().map(r => (r.getLong(1), Option(r.getString(3)).orNull)).toMap
    // 100→q260 is 160 ahead (stale); 200→q260 is 60 ahead (stale);
    // 300 has nothing at-or-after
    assert(fwd === Map(100L -> null, 200L -> null, 300L -> null))
    val fwd2 = AsofJoin.asof(trades, quotes, "k", "qk", "ts", "qts",
        forward = true, tolerance = Some(200L))
      .select("k", "ts", "trade", "quote")
      .collect().map(r => (r.getLong(1), Option(r.getString(3)).orNull)).toMap
    assert(fwd2 === Map(100L -> "q260", 200L -> "q260", 300L -> null))
  }

  test("null keys and timestamps never match and never NPE (left-outer nulls)") {
    val trades = Seq(
      (Some(1L), Some(100L), "t1"),
      (None, Some(100L), "tnullk"),   // null key → null right
      (Some(1L), None, "tnullts")     // null ts → null right
    ).toDF("k", "ts", "trade")
    val quotes = Seq(
      (Some(1L), Some(60L), "q60"),
      (None, Some(10L), "qnullk"),    // discarded on sight
      (Some(1L), None, "qnullts")     // discarded on sight
    ).toDF("qk", "qts", "quote")
    val got = AsofJoin.asof(trades, quotes, "k", "qk", "ts", "qts")
      .select("trade", "quote")
      .collect().map(r => r.getString(0) -> Option(r.getString(1)).orNull).toMap
    assert(got === Map("t1" -> "q60", "tnullk" -> null, "tnullts" -> null))
    val fwd = AsofJoin.asof(trades, quotes, "k", "qk", "ts", "qts", forward = true)
      .select("trade", "quote")
      .collect().map(r => r.getString(0) -> Option(r.getString(1)).orNull).toMap
    assert(fwd === Map("t1" -> null, "tnullk" -> null, "tnullts" -> null))
  }

  test("type contract enforced at plan build: non-atomic key, mismatched types, string-ts tolerance") {
    val l = Seq((Array(1L), 1L, 1L)).toDF("ak", "k", "ts")
      .withColumn("sts", col("ts").cast("string"))
    val r = Seq((Array(1L), 1L, 1L)).toDF("aqk", "qk", "qts")
      .withColumn("sqts", col("qts").cast("string"))
    intercept[IllegalArgumentException] {
      AsofJoin.asof(l, r, "ak", "aqk", "ts", "qts") // array key
    }
    intercept[IllegalArgumentException] {
      AsofJoin.asof(l, r, "k", "sqts", "ts", "qts") // long vs string key
    }
    intercept[IllegalArgumentException] {
      AsofJoin.asof(l, r, "k", "qk", "sts", "sqts", tolerance = Some(5L))
    } // tolerance needs integral ts
    // string ts WITHOUT tolerance is legal (lexicographic as-of)
    assert(AsofJoin.asof(l, r, "k", "qk", "sts", "sqts").count() === 1)
  }

  test("string keys over bucketed (exchange- and sort-elided) reads: cached key survives batch reuse") {
    // Many string keys, many rows per key, read through bucketed
    // tables so AsofJoinExec consumes columnar batches directly —
    // the path where an uncopied cached UTF8String would mutate when
    // the next page loads. Compare against the plain shuffled path.
    val trades = Seq.tabulate(2000)(i => (s"key_${i % 97}", i.toLong * 7, s"t$i"))
      .toDF("k", "ts", "trade")
    val quotes = Seq.tabulate(1000)(i => (s"key_${i % 97}", i.toLong * 13, s"q$i"))
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
    write("asof_left_str", trades, "k", "ts")
    write("asof_right_str", quotes, "qk", "qts")
    val df = AsofJoin.asof(
      spark.table("asof_left_str"), spark.table("asof_right_str"),
      "k", "qk", "ts", "qts")
    val plan = df.queryExecution.executedPlan.toString
    val idx = plan.indexOf("AsofJoin")
    assert(idx >= 0 && !plan.substring(idx).contains("Exchange"), plan)
    def canon(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        Option(r.getString(5)).orNull)).toSet
    val got = canon(df)
    val plain = canon(AsofJoin.asof(trades, quotes, "k", "qk", "ts", "qts"))
    assert(got === plain)
    assert(got.nonEmpty)
  }

  test("skewed key under AQE: one mega-key joins correctly alongside singleton keys") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try {
      // 10k left rows on ONE key + scattered singletons; AQE must not
      // split the mega-key's partition under a ClusteredDistribution
      // requirement (which would break merge completeness) — assert
      // exact per-row matches survive whatever AQE replans.
      val skewL = Seq.tabulate(10000)(i => (42L, i.toLong, s"t$i")) ++
        Seq.tabulate(50)(i => (1000L + i, i.toLong, s"s$i"))
      val skewR = Seq.tabulate(200)(i => (42L, i.toLong * 50, s"q$i")) ++
        Seq.tabulate(50)(i => (1000L + i, 0L, s"r$i"))
      val got = AsofJoin.asof(
          skewL.toDF("k", "ts", "trade"), skewR.toDF("qk", "qts", "quote"),
          "k", "qk", "ts", "qts")
        .select("k", "ts", "quote")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          Option(r.getString(2)).orNull))
      assert(got.length === skewL.size)
      got.foreach {
        case (42L, ts, q) =>
          val expect = s"q${ts / 50}" // greatest i with 50i <= ts
          assert(q === expect, s"mega-key row at ts=$ts")
        case (k, ts, q) if k >= 1000L =>
          assert(q === s"r${k - 1000L}", s"singleton key $k at ts=$ts")
        case other => fail(s"unexpected row $other")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("join_asof_tol: exec tolerance ≡ window form + staleness gate on sf0.001") {
    import org.apache.spark.sql.DataFrame
    def canon(df: DataFrame) = df.collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) Long.MinValue else r.getLong(4))
    }.toSet
    // expected: the union+carry-forward window form, staleness-gated at
    // exact NANOSECOND precision (gap_s is floored to seconds, so
    // gating on it would mis-classify sub-second boundary overshoot)
    val ev = graft.core.Tables.events(spark, sfDir)
    val u = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"), lit(0).as("side"))
      .unionByName(ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"), lit(1).as("side")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("side"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val tolNs = 3600L * 1000000000L
    val window = u
      .withColumn("asof_click",
        last(when(col("side") === 0, col("event_id")), ignoreNulls = true).over(w))
      .withColumn("asof_ts",
        last(when(col("side") === 0, col("ts")), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .withColumn("fresh", col("asof_ts").isNotNull &&
        col("ts") - col("asof_ts") <= tolNs)
      .select(col("event_id").as("purchase_id"), col("user_id"),
        expr("ts DIV 1000000000").as("purchase_s"),
        when(col("fresh"), col("asof_click")).as("click_id"),
        when(col("fresh"), expr("(ts - asof_ts) DIV 1000000000")).as("gap_s"))
    val got = canon(Temporal.joinAsofTol(spark, sfDir))
    assert(got === canon(window))
    assert(got.nonEmpty)
    // the gate must actually bite at this SF — some purchase has only
    // a stale click (else the query is indistinguishable from exec)
    assert(got.exists(_._4 == -1L) && got.exists(_._4 >= 0L))
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
