package graft

import graft.queries.Temporal

/** attribution_decay contracts: equals a sequential recompute of the
  * discretized exponential decay, and per-purchase credit mass is
  * conserved up to DIV truncation (< k micro-cents short).
  */
class DecaySpec extends SparkSuite {

  test("attribution_decay equals the sequential recompute; mass conserved") {
    val evs = graft.core.Tables.events(spark, sfDir)
      .selectExpr("event_type", "event_id", "user_id", "ts",
        "CAST(floor(value * 100 + 0.5) AS BIGINT) AS v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val clicks = evs.filter(_._1 == "click")
    val purchases = evs.filter(_._1 == "purchase")
    val winNs = 3600L * 1000000000L
    val hlNs = 900L * 1000000000L
    val pairs = for {
      (_, cid, cu, cts, _) <- clicks
      (_, pid, pu, pts, v) <- purchases
      if cu == pu && pts >= cts && pts - cts <= winNs
    } yield (cid, cu, pid, v, 1000000L >> ((pts - cts) / hlNs).toInt)
    val swByP = pairs.groupBy(_._3).view.mapValues(_.map(_._5).sum).toMap
    val terms = pairs.map { case (cid, cu, pid, v, w) =>
      (cid, cu, pid, v * w * 1000000L / swByP(pid))
    }
    val expect = terms.groupBy(t => (t._1, t._2)).view
      .mapValues(ts => (ts.length.toLong, ts.map(_._4).sum)).toMap
    val got = Temporal.attributionDecay(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got == expect)
    assert(expect.nonEmpty)
    // mass conservation: per purchase, total credit within k of v·1e6
    terms.groupBy(_._3).foreach { case (pid, ts) =>
      val v = pairs.find(_._3 == pid).get._4
      val tot = ts.map(_._4).sum
      assert(tot <= v * 1000000L && v * 1000000L - tot < ts.length,
        s"purchase $pid mass $tot vs ${v * 1000000L}")
    }
  }
}
