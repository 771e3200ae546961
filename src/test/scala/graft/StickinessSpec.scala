package graft

import graft.queries.Stickiness

/** dau_mau contracts: equals a sequential trailing-window recompute;
  * MAU ≥ DAU and stickiness ≤ 1e6 by construction.
  */
class StickinessSpec extends SparkSuite {

  test("user_growth equals the sequential first-seen recompute") {
    val evs = graft.core.Tables.events(spark, sfDir)
      .selectExpr("ts DIV 86400000000000 AS day", "user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val firstSeen = evs.groupBy(_._2).view.mapValues(_.map(_._1).min)
    val newBy = firstSeen.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val days = newBy.keys.toSeq.sorted
    var cum = 0L
    val expect = days.map { d => cum += newBy(d); d -> (newBy(d), cum) }.toMap
    val got = Stickiness.userGrowth(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expect)
    assert(got.values.map(_._1).sum == firstSeen.size.toLong)
  }

  test("retention_dn equals the sequential shifted-set recompute") {
    val ud = graft.core.Tables.events(spark, sfDir)
      .selectExpr("ts DIV 86400000000000 AS day", "user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expect = ud.map(_._1).map { d =>
      val active = ud.filter(_._1 == d).map(_._2)
      val n = active.size.toLong
      val d1 = active.count(u => ud((d + 1, u))).toLong
      val d7 = active.count(u => ud((d + 7, u))).toLong
      d -> (n, d1, d7, d1 * 1000000L / n, d7 * 1000000L / n)
    }.toMap
    val got = Stickiness.retentionDn(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got == expect)
  }

  test("dau_mau equals the sequential trailing-window recompute") {
    val ud = graft.core.Tables.events(spark, sfDir)
      .selectExpr("ts DIV 86400000000000 AS day", "user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val days = ud.map(_._1)
    val expect = days.map { d =>
      val dau = ud.count(_._1 == d).toLong
      val mau = ud.filter(t => t._1 >= d - (Stickiness.WindowDays - 1) && t._1 <= d)
        .map(_._2).size.toLong
      d -> (dau, mau, dau * 1000000L / mau)
    }.toMap
    val got = Stickiness.dauMau(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == expect)
    got.values.foreach { case (dau, mau, st) =>
      assert(mau >= dau && st <= 1000000L)
    }
  }
}
