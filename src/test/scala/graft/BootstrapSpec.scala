package graft

import graft.queries.Stats

/** bootstrap_ci contracts: resample means and CI bounds equal a
  * sequential replay of the md5 Poisson-weight scheme; bounds are
  * ordered and the weight distribution is Poisson(1)-shaped.
  */
class BootstrapSpec extends SparkSuite {

  private def u(eventId: Long, b: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"boot:$eventId:$b".getBytes("UTF-8"))
    val hex = md.take(3).map(x => f"${x & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex, 16) % 1000000L
  }

  private val thr = Seq(367879L, 735758L, 919698L, 981011L, 996340L)
  private def weight(uu: Long): Long = thr.indexWhere(uu < _) match {
    case -1 => 5L
    case k => k.toLong
  }

  test("bootstrap_ci equals the sequential replay") {
    val rows = graft.core.Tables.events(spark, sfDir)
      .selectExpr("event_type", "event_id",
        "CAST(floor(value * 100 + 0.5) AS BIGINT) AS v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = rows.groupBy(_._1).map { case (et, rs) =>
      val n = rs.length.toLong
      val mean = rs.map(_._3).sum * 1000000L / n
      val means = (0 until Stats.BootB).map { b =>
        val ws = rs.map(t => (weight(u(t._2, b)), t._3))
        val sw = ws.map(_._1).sum
        (ws.map(t => t._1 * t._2).sum * 1000000L / sw, b)
      }.sorted
      et -> (n, mean, means(1)._1, means(Stats.BootB - 2)._1)
    }
    val got = Stats.bootstrapCi(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == expect)
    got.values.foreach { case (_, _, lo, hi) => assert(lo <= hi) }
    // weight sanity: mean weight ≈ 1 (Poisson(1))
    val allW = rows.take(500).flatMap(t => (0 until 4).map(b => weight(u(t._2, b))))
    val mw = allW.sum.toDouble / allW.length
    assert(mw > 0.8 && mw < 1.2, s"mean weight $mw far from 1")
  }
}
