package graft

import graft.queries.Decompose

/** ts_decompose contracts: the additive identity holds exactly and
  * the whole decomposition equals a sequential recompute.
  */
class DecomposeSpec extends SparkSuite {

  test("ts_decompose: additive identity and sequential equality") {
    val hourly = graft.core.Tables.events(spark, sfDir)
      .selectExpr("ts DIV 3600000000000 AS hour").collect()
      .map(_.getLong(0)).groupBy(identity).view
      .mapValues(_.length.toLong).toSeq.sortBy(_._1)
    val hours = hourly.map(_._1)
    val ns = hourly.map(_._2)
    val trend = ns.indices.map { i =>
      val lo = math.max(0, i - 12); val hi = math.min(ns.length - 1, i + 12)
      val cells = (lo to hi).map(ns)
      cells.sum * 1000000L / cells.length
    }
    val det = ns.indices.map(i => ns(i) * 1000000L - trend(i))
    val seas = ns.indices.groupBy(i => hours(i) % 24).view.mapValues { is =>
      val tot = is.map(det).sum
      // integer DIV truncates toward zero — replicate for negatives
      val q = BigInt(tot) / is.length
      q.toLong
    }.toMap
    val expect = ns.indices.map { i =>
      (hours(i), (ns(i), trend(i), seas(hours(i) % 24),
        det(i) - seas(hours(i) % 24)))
    }.toMap
    val got = Decompose.tsDecompose(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got == expect)
    // additive identity: n·1e6 = trend + seasonal + residual
    got.foreach { case (h, (n, t, se, re)) =>
      assert(n * 1000000L == t + se + re, s"identity broken at hour $h")
    }
  }
}
