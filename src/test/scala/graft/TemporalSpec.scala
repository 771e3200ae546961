package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.queries.Temporal

/** As-of and band join semantics, differentially checked against the
  * naive inequality-join formulation (the quadratic plan the scalable
  * forms replace — same answers, different asymptotics).
  */
class TemporalSpec extends SparkSuite {

  private lazy val ev = Tables.events(spark, sfDir).cache()

  test("joinAsof matches the naive inequality-join formulation") {
    val got = Temporal.joinAsof(spark, sfDir).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) -1L else r.getLong(3)))
      .toMap

    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"), col("event_id").as("cid"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pts"), col("event_id").as("pid"))
    // Naive as-of: left join all prior clicks, keep the latest per purchase.
    val naive = purchases
      .join(clicks, col("cu") === col("pu") && col("cts") <= col("pts"), "left")
      .groupBy("pid")
      .agg(max(struct(col("cts"), col("cid"))).as("best"))
      .select(col("pid"), col("best.cid"))
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap

    assert(got.size === naive.size)
    assert(got === naive)
  }

  test("joinAsof: every purchase appears exactly once; gaps non-negative") {
    val rows = Temporal.joinAsof(spark, sfDir).collect()
    val nPurch = ev.filter(col("event_type") === "purchase").count()
    assert(rows.length.toLong === nPurch)
    assert(rows.map(_.getLong(0)).distinct.length === rows.length)
    rows.filter(!_.isNullAt(4)).foreach(r => assert(r.getLong(4) >= 0))
  }

  test("joinRange matches the naive inequality join") {
    val got = Temporal.joinRange(spark, sfDir).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSet

    val bandNs = 600L * 1000000000L
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"), col("event_id").as("cid"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pts"), col("event_id").as("pid"))
    val naive = purchases
      .join(clicks, col("cu") === col("pu") &&
        col("pts") >= col("cts") && col("pts") - col("cts") <= bandNs)
      .select(col("cid"), col("pid"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(got === naive)
  }

  test("joinAsofNearest matches the naive min-|Δt| formulation") {
    val rows = Temporal.joinAsofNearest(spark, sfDir).collect()
    val got = rows.filter(!_.isNullAt(3))
      .map(r => (r.getLong(0), r.getLong(3))).toMap
    val nNull = rows.count(_.isNullAt(3))

    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"), col("event_id").as("cid"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pts"), col("event_id").as("pid"))
    // Naive nearest: all same-user pairs, min by (|Δt|, back-first,
    // then the window's tie order: back → max cid, fwd → min cid).
    val naive = purchases.join(clicks, col("cu") === col("pu"))
      .groupBy("pid")
      .agg(min(struct(
        abs(col("pts") - col("cts")).as("g"),
        (col("cts") > col("pts")).cast("int").as("fwd"),
        when(col("cts") > col("pts"), col("cid")).otherwise(-col("cid")).as("k"))).as("best"))
      .select(col("pid"), abs(col("best.k")).as("cid"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap

    assert(got === naive)
    val nPurch = ev.filter(col("event_type") === "purchase").count()
    assert(nNull.toLong === nPurch - naive.size)
    // dir/gap consistency: back gaps and fwd gaps are all non-negative
    rows.filter(!_.isNullAt(4)).foreach(r => assert(r.getLong(4) >= 0))
  }

  test("joinAsofNearest plan: one shuffle family, no nested-loop join") {
    val plan = Temporal.joinAsofNearest(spark, sfDir).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("scd2History ≡ per-user Scala fold; intervals tile the timeline") {
    val got = graft.queries.EventOps.scd2History(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getInt(4))).toSet

    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("ts DIV 1000000000").as("ts_s"),
        col("event_id"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val expected = purchases.groupBy(_._1).flatMap { case (uid, evs) =>
      val ordered = evs.sortBy(e => (e._2, e._3))
        .map(e => (e._2, math.floor(e._4 / 50).toInt))
      val changes = ordered.foldLeft(Vector.empty[(Long, Int)]) {
        case (acc, (ts, tier)) =>
          if (acc.nonEmpty && acc.last._2 == tier) acc else acc :+ ((ts, tier))
      }
      changes.zipWithIndex.map { case ((from, tier), i) =>
        val to = if (i + 1 < changes.length) changes(i + 1)._1 - 1 else -1L
        (uid, tier, from, to, if (to == -1L) 1 else 0)
      }
    }.toSet
    assert(got === expected)

    // exactly one open (is_current) version per user with purchases
    val open = got.groupBy(_._1).map { case (_, vs) => vs.count(_._5 == 1) }
    assert(open.forall(_ === 1))
    // versions tile: each closed interval ends right before the next opens
    got.groupBy(_._1).values.foreach { vs =>
      val s = vs.toSeq.sortBy(_._3)
      s.sliding(2).foreach {
        case Seq(a, b) => assert(a._4 === b._3 - 1)
        case _ =>
      }
    }
  }

  test("joinPit ≡ explicit interval join against scd2History; no leak from the future") {
    val got = graft.queries.EventOps.joinPit(spark, sfDir).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) -1 else r.getInt(3))).toMap

    val versions = graft.queries.EventOps.scd2History(spark, sfDir)
      .select(col("user_id").as("vu"), col("tier"),
        col("effective_from"), col("effective_to"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), expr("ts DIV 1000000000").as("s"), col("event_id"))
    val naive = views.join(versions,
        col("user_id") === col("vu") && col("effective_from") <= col("s") &&
          (col("effective_to").isNull || col("s") <= col("effective_to")), "left")
      .select(col("event_id"), col("tier"))
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1 else r.getInt(1))).toMap

    assert(got === naive)
    assert(got.nonEmpty && got.values.exists(_ >= 0))
  }

  test("cdcMerge: latest change wins, tombstoned keys vanish") {
    val ev = graft.core.Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getDouble(4)))
    val byUser = ev.groupBy(_._1)
    val expect = byUser.flatMap { case (u, rows) =>
      val last = rows.maxBy(r => (r._2, r._3))
      if (last._4 == "error") None
      else Some(u -> (last._3, last._4, last._5, rows.length.toLong))
    }
    val got = Temporal.cdcMerge(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2), r.getDouble(3),
        r.getLong(5)))
      .toMap
    assert(got === expect)
    // some user's history must actually end in a tombstone for the
    // delete path to be exercised at this SF
    assert(byUser.size > got.size)
  }

  test("cdc_merge_stream (stateful code path on batch rows) ≡ cdcMerge") {
    val batch = Temporal.cdcMerge(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3),
        r.getLong(4), r.getLong(5))).toSet
    val stream = Temporal.cdcMergeStream(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(stream === batch && stream.nonEmpty)
  }

  test("attributionLinear ≡ naive inequality-join split; credit conserved") {
    val ev = graft.core.Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getDouble(4)))
    val WindowNs = 3600L * 1000000000L
    val clicks = ev.filter(_._4 == "click")
    val purchases = ev.filter(_._4 == "purchase")
    // naive: every (click, purchase) pair with 0 <= pts - cts <= 1h
    val pairs = for {
      c <- clicks; p <- purchases
      if c._1 == p._1 && p._2 >= c._2 && p._2 - c._2 <= WindowNs
    } yield (c._3, c._1, p._3, p._5)
    val k = pairs.groupBy(_._3).view.mapValues(_.length).toMap
    val expect = pairs.groupBy(x => (x._1, x._2)).map { case (key, ps) =>
      val credit = ps.map(p => p._4 / k(p._3)).sum
      key -> (ps.length.toLong, math.floor(credit * 10000 + 0.5) / 10000.0)
    }
    val got = Temporal.attributionLinear(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got === expect)
    // conservation: attributed credit equals the value of every
    // purchase that found at least one qualifying click
    val attributed = got.values.map(_._2).sum
    val reachable = purchases.filter(p => k.contains(p._3)).map(_._5).sum
    assert(math.abs(attributed - reachable) < 1e-2)
  }

  test("featureRolling ≡ per-user Scala fold over sorted histories") {
    val ev = graft.core.Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val expect = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      sorted.zipWithIndex.map { case ((_, ts, id, _), i) =>
        val gap = if (i == 0) None else Some((ts - sorted(i - 1)._2) / 1000000000L)
        val prev5 = sorted.slice(math.max(0, i - 5), i).map(_._4)
        val avg5 = if (prev5.isEmpty) None
          else Some(math.floor(prev5.sum / prev5.length * 10000 + 0.5) / 10000.0)
        val cnt = rows.count(r => r._2 <= ts && r._2 >= ts - 3600L * 1000000000L)
        id -> (gap, avg5, cnt.toLong)
      }
    }.toMap
    val out = graft.queries.EventOps.featureRolling(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> (
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        r.getLong(4)))
      .toMap
    assert(out === expect)
  }

  test("eventsOhlc ≡ per-bucket Scala fold (open/close by event order)") {
    val ev = graft.core.Tables.events(spark, sfDir)
      .select(col("ts"), col("event_id"), col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    val expect = ev.groupBy(r => (r._1 / 3600000000000L, r._3)).map {
      case ((h, t), rows) =>
        val sorted = rows.sortBy(r => (r._1, r._2))
        (h, t) -> (sorted.head._4, rows.map(_._4).max, rows.map(_._4).min,
          sorted.last._4, rows.length.toLong,
          math.floor(rows.map(_._4).sum * 10000 + 0.5) / 10000.0)
    }
    val got = graft.queries.EventOps.eventsOhlc(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getLong(6), r.getDouble(7)))
      .toMap
    assert(got === expect)
  }

  test("privacyErase manifest covers exactly the keys cdcMerge tombstoned") {
    val live = Temporal.cdcMerge(spark, sfDir)
      .select("user_id").collect().map(_.getLong(0)).toSet
    val all = graft.core.Tables.events(spark, sfDir)
      .select("user_id").distinct().collect().map(_.getLong(0)).toSet
    val manifest = Temporal.privacyErase(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(manifest.keySet === (all -- live) && manifest.nonEmpty)
    // counts must equal the user's full history size
    val counts = graft.core.Tables.events(spark, sfDir)
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    manifest.foreach { case (u, n) => assert(n === counts(u)) }
  }

  test("userRfm ≡ Scala fold; quartiles partition the purchasers") {
    val ev = graft.core.Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    val now = ev.map(_._2).max
    val expect = ev.filter(_._3 == "purchase").groupBy(_._1).map {
      case (u, rows) =>
        u -> ((now - rows.map(_._2).max) / 3600000000000L,
          rows.length.toLong,
          math.floor(rows.map(_._4).sum * 100 + 0.5) / 100.0)
    }
    val got = graft.queries.EventOps.userRfm(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getInt(4)))
      .toMap
    assert(got.view.mapValues(v => (v._1, v._2, v._3)).toMap === expect)
    // ntile(4) buckets differ in size by at most 1 and are ordered
    val sizes = got.values.groupBy(_._4).view.mapValues(_.size).toMap
    assert(sizes.keySet === Set(1, 2, 3, 4))
    assert(sizes.values.max - sizes.values.min <= 1)
  }

  test("journeyTransitions ≡ Scala fold; rows of the matrix sum to 1") {
    val ev = graft.core.Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val trans = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val s = rows.sortBy(r => (r._2, r._3)).map(_._4)
      s.zip(s.drop(1))
    }
    val nFrom = trans.groupBy(_._1).view.mapValues(_.length).toMap
    val expect = trans.groupBy(identity).map { case ((a, b), xs) =>
      (a, b) -> (xs.length.toLong,
        math.floor(xs.length.toDouble / nFrom(a) * 10000 + 0.5) / 10000.0)
    }
    val got = graft.queries.EventOps.journeyTransitions(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got === expect)
    got.keys.map(_._1).toSet.foreach { (a: String) =>
      val rowSum = got.collect { case ((`a`, _), (_, p)) => p }.sum
      assert(math.abs(rowSum - 1.0) < 1e-3)
    }
  }

  test("forecastBaseline: leak-free split and exact MAE recompute") {
    val ev = graft.core.Tables.events(spark, sfDir)
      .select(col("event_type"), col("ts"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val cells = ev.map { case (t, ts) =>
      (t, ts / 86400000000000L, (ts / 3600000000000L) % 24)
    }
    val lastDay = cells.map(_._2).max
    val cnt = cells.groupBy(identity).view.mapValues(_.length).toMap
    val train = cells.filter(_._2 < lastDay)
    val pred = train.groupBy(c => (c._1, c._3)).map { case (k, rs) =>
      k -> rs.length.toDouble / rs.map(_._2).distinct.length
    }
    val test = cells.filter(_._2 == lastDay).distinct
    val expect = test.groupBy(_._1).collect {
      case (t, cs0) =>
        val cs = cs0.filter(c => pred.contains((c._1, c._3)))
        t -> (cs.length.toLong,
          math.floor(cs.map(c => math.abs(cnt(c) - pred((c._1, c._3))))
            .sum / cs.length * 10000 + 0.5) / 10000.0)
    }
    val got = graft.queries.EventOps.forecastBaseline(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(got === expect && got.nonEmpty)
  }

  test("journeyPaths and trendWow ≡ Scala recompute") {
    val ev = graft.core.Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // paths
    val trips = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val s = rows.sortBy(r => (r._2, r._3)).map(_._4)
      s.sliding(3).filter(_.length == 3).map(x => (x(0), x(1), x(2)))
    }
    val expectPaths = trips.groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.sortBy { case ((a, b, c), n) => (-n, a, b, c) }.take(10).toMap
    val gotPaths = graft.queries.EventOps.journeyPaths(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3))
      .toMap
    assert(gotPaths === expectPaths)
    // weekly trend
    val weekly = ev.groupBy(r => (r._4, r._2 / 604800000000000L))
      .view.mapValues(_.length.toLong).toMap
    val gotTrend = graft.queries.EventOps.trendWow(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toMap
    assert(gotTrend.view.mapValues(_._1).toMap === weekly)
    // prev_n = the previous PRESENT week's count (lag over the frame)
    weekly.keys.groupBy(_._1).foreach { case (t, ks) =>
      val ws = ks.map(_._2).toSeq.sorted
      ws.zipWithIndex.foreach { case (w, i) =>
        val expectPrev = if (i == 0) None else Some(weekly((t, ws(i - 1))))
        assert(gotTrend((t, w))._2 === expectPrev)
      }
    }
  }

  test("featureScale: clamped z-scores center near 0; clipped = outside band") {
    val rows = graft.queries.EventOps.featureScale(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3)))
    assert(rows.length === 1000)
    rows.groupBy(_._2).foreach { case (_, rs) =>
      val mean = rs.map(_._3).sum / rs.length
      assert(math.abs(mean) < 1e-2, s"mean $mean should be ~0 after centering")
      // ~10% clipped by construction (p5/p95 band), tolerating ties
      val frac = rs.count(_._4 == 1).toDouble / rs.length
      assert(frac > 0.02 && frac < 0.2, s"clip fraction $frac")
      // clipped rows sit exactly at the band edge after clamping
      val clippedVals = rs.filter(_._4 == 1).map(_._3).distinct
      assert(clippedVals.length <= 2)
    }
  }

  test("joinAsof plan has no nested-loop join (scalable form)") {
    val plan = Temporal.joinAsof(spark, sfDir).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("joinRange plan joins on equi-keys, no nested loop") {
    val plan = Temporal.joinRange(spark, sfDir).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("attribution_position: per-purchase weights form a U and sum to 1") {
    import org.apache.spark.sql.functions._
    // total credited value ≈ total purchase value of attributed
    // purchases (weights per purchase sum to exactly 1 modulo the 1e-6
    // per-term quantization × touch count)
    val pos = Temporal.attributionPosition(spark, sfDir)
      .agg(sum("credit")).collect()(0).getDouble(0)
    val lin = Temporal.attributionLinear(spark, sfDir)
      .agg(sum("credit")).collect()(0).getDouble(0)
    assert(math.abs(pos - lin) < 0.01 * math.max(1.0, lin),
      s"U-shaped total $pos deviates from linear total $lin — weights don't sum to 1")
    // same attributed click set as the linear model (same pair producer)
    val kPos = Temporal.attributionPosition(spark, sfDir).count()
    val kLin = Temporal.attributionLinear(spark, sfDir).count()
    assert(kPos === kLin)
  }
}
