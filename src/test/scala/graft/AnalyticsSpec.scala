package graft

import graft.queries.{EventOps, Relational}

/** mv_merge and pattern_match contracts: merge ≡ recompute inside
  * Spark, and a sequential pattern-scan reference.
  */
class AnalyticsSpec extends SparkSuite {

  test("mv_merge equals the single-pass recompute") {
    import org.apache.spark.sql.functions._
    val merged = Relational.mvMerge(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val full = graft.core.Tables.orders(spark, sfDir)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        round(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")) / 100.0, 2)
          .as("t"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(merged === full)
  }

  test("concurrency_profile: valid sweep (never negative, ends at zero, max matches)") {
    val rows = EventOps.concurrencyProfile(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // rows re-ordered deterministically: (ts, +1 first, user)
    val ordered = rows.sortBy(t => (t._1, -t._2, t._3))
    var run = 0L
    ordered.foreach { case (_, delta, _, nActive) =>
      run += delta
      assert(run >= 0, "active count went negative")
    }
    assert(run === 0L, "sweep must end with all sessions closed")
    val maxGot = rows.map(_._4).max
    assert(maxGot >= 1)
    // sequential recompute of max concurrency from raw sessions
    val NS = 1000000000L
    val ev = graft.core.Tables.events(spark, sfDir)
      .select("user_id", "ts").collect().map(r => (r.getLong(0), r.getLong(1)))
    val sessions = ev.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      val ts = es.map(_._2).sorted
      val bounds = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var (st, prev) = (ts.head, ts.head)
      ts.tail.foreach { t =>
        if (t - prev >= 1800L * NS) { bounds += ((st, prev)); st = t }
        prev = t
      }
      bounds += ((st, prev))
      bounds.map { case (a, b) => (u, a, b) }
    }
    val pts = sessions.flatMap { case (u, a, b) => Seq((a, 1, u), (b, -1, u)) }
      .sortBy(t => (t._1, -t._2, t._3))
    var (cur, mx) = (0L, 0L)
    pts.foreach { p => cur += p._2; mx = math.max(mx, cur) }
    assert(maxGot === mx)
  }

  test("funnel_latency quartiles ≡ sequential recompute") {
    val ev = graft.core.Tables.events(spark, sfDir)
      .select("user_id", "ts", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byUser = ev.groupBy(_._1)
    val gaps = byUser.values.flatMap { g =>
      val views = g.filter(_._3 == "view").map(_._2)
      if (views.isEmpty) None
      else {
        val v = views.min
        val ps = g.filter(e => e._3 == "purchase" && e._2 >= v).map(_._2)
        if (ps.isEmpty) None else Some((ps.min - v) / 1000000000L)
      }
    }.toArray.sorted
    def q(p: Double): Double = {
      val h = (gaps.length - 1) * p
      val lo = h.toInt
      if (lo == gaps.length - 1) gaps(lo).toDouble
      else gaps(lo) + (gaps(lo + 1) - gaps(lo)) * (h - lo)
    }
    val r = EventOps.funnelLatency(spark, sfDir).collect()(0)
    assert(r.getLong(0) === gaps.length.toLong)
    assert(r.getDouble(1) === q(0.25))
    assert(r.getDouble(2) === q(0.5))
    assert(r.getDouble(3) === q(0.75))
  }

  test("cohort_ltv: cumulative values are monotone and conserve purchase mass") {
    import org.apache.spark.sql.functions._
    val rows = EventOps.cohortLtv(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, g) =>
      val byAge = g.sortBy(_._2).map(_._4)
      assert(byAge.zip(byAge.tail).forall { case (a, b) => a <= b }, "not monotone")
    }
    // final cumulative per cohort sums to the total quantized purchase value
    val finalSum = rows.groupBy(_._1).values.map(_.maxBy(_._2)._4).sum
    val total = graft.core.Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .agg(sum(floor(col("value") * 100 + 0.5).cast("long")))
      .collect()(0).getLong(0) / 100.0
    assert(math.abs(finalSum - total) < 0.01)
  }

  test("dq_checks: rule battery verdicts match direct recounts") {
    import org.apache.spark.sql.functions._
    val rules = graft.queries.DataQuality.dqChecks(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(rules.size === 6)
    rules.values.foreach { case (checked, failed, pass) =>
      assert(failed >= 0 && failed <= checked)
      assert(pass === (failed == 0))
    }
    val l = graft.core.Tables.lineitem(spark, sfDir)
    assert(rules("lineitem_pk_unique")._2 ===
      l.count() - l.select("l_orderkey", "l_linenumber").distinct().count())
    val orphan = graft.core.Tables.orders(spark, sfDir)
      .join(graft.core.Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"), "left_anti").count()
    assert(rules("orders_custkey_in_customer")._2 === orphan)
  }

  test("source_freshness: watermark stream has zero lag; lags non-negative") {
    val rows = graft.queries.DataQuality.sourceFreshness(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    assert(rows.exists(_._3 == 0L), "some stream defines the watermark")
    rows.foreach { case (_, _, lag, stale) =>
      assert(lag >= 0)
      assert(stale === (lag > 7L * 86400L))
    }
  }

  test("classifier_bias_report: disparities sum to ~0 weighted by size") {
    val rows = graft.queries.Classifier.classifierBiasReport(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    assert(rows.nonEmpty)
    val tot = rows.map(_._2).sum
    val totAcc = rows.map(_._3).sum
    val overall = totAcc.toDouble / tot
    rows.foreach { case (_, n, acc, rate, disp) =>
      assert(acc <= n)
      assert(math.abs(rate - acc.toDouble / n) < 1e-3)
      assert(math.abs(disp - (acc.toDouble / n - overall)) < 1e-3)
    }
    // size-weighted disparity is zero by construction
    val weighted = rows.map { case (_, n, _, _, disp) => n * disp }.sum / tot
    assert(math.abs(weighted) < 1e-3)
  }

  test("journey_entropy: bounds and sequential recompute") {
    val ev = graft.core.Tables.events(spark, sfDir)
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = ev.groupBy(_._1).map { case (u, g) =>
      val counts = g.groupBy(_._2).values.map(_.size)
      val n = counts.sum
      val sumQ = counts.map { c =>
        val p = c.toDouble / n
        math.floor(-p * math.log(p) * 1e9 + 0.5).toLong
      }.sum
      u -> (n.toLong, math.floor(sumQ / 1e5 + 0.5) / 1e4)
    }
    val got = graft.queries.EventOps.journeyEntropy(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got === expected)
    got.values.foreach { case (_, h) =>
      assert(h >= 0.0 && h <= math.log(5.0) + 1e-9) // ≤ ln|event types|
    }
  }

  test("pattern_match ≡ sequential adjacency scan") {
    val ev = graft.core.Tables.events(spark, sfDir)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val bound = 48L * 3600L * 1000000000L
    val expected = ev.groupBy(_._1).values.flatMap { g =>
      val s = g.sortBy(e => (e._2, e._3)).toSeq
      s.sliding(3).collect {
        case Seq(v, c, p)
          if v._4 == "view" && c._4 == "click" && p._4 == "purchase" &&
            p._2 - v._2 <= bound =>
          (v._1, v._3, c._3, p._3, (p._2 - v._2) / 1000000000L)
      }
    }.toSet
    val got = EventOps.patternMatch(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }
}
