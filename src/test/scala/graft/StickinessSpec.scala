package graft

import graft.queries.Stickiness

/** dau_mau contracts: equals a sequential trailing-window recompute;
  * MAU ≥ DAU and stickiness ≤ 1e6 by construction.
  */
class StickinessSpec extends SparkSuite {

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
