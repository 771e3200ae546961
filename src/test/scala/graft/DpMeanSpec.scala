package graft

import graft.queries.Privacy

/** privacy_dp_mean contracts: noise replays from the md5 seed, the
  * clip bound is enforced, and the released mean is the noisy ratio.
  */
class DpMeanSpec extends SparkSuite {

  private def u(tag: String, et: String): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$tag$et".getBytes("UTF-8"))
    val hex = md.take(3).map(x => f"${x & 0xff}%02x").mkString
    (java.lang.Long.parseLong(hex, 16) % 1000000L + 0.5) / 1000000.0
  }

  private def lap(uu: Double, scale: Double): Long =
    math.floor(-math.signum(uu - 0.5) * scale
      * math.log(1.0 - 2.0 * math.abs(uu - 0.5)) * 1000000 + 0.5).toLong

  test("privacy_dp_mean equals the sequential replay") {
    val rows = graft.core.Tables.events(spark, sfDir)
      .selectExpr("event_type",
        s"least(greatest(CAST(floor(value * 100 + 0.5) AS BIGINT), 0L), ${Privacy.DpClipCents})")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expect = rows.groupBy(_._1).map { case (et, rs) =>
      val n = rs.length.toLong
      val sum = rs.map(_._2).sum
      val relSum = sum * 1000000L + lap(u("dpm_s:", et), 2.0 * Privacy.DpClipCents)
      val relN = n * 1000000L + lap(u("dpm_n:", et), 2.0)
      val mean = math.floor(relSum.toDouble / relN.toDouble * 1000000 + 0.5).toLong
      et -> (n, sum, relSum, relN, mean)
    }
    val got = Privacy.privacyDpMean(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got == expect)
    // the clip really binds somewhere (values above 100.00 exist)
    assert(rows.exists(_._2 == Privacy.DpClipCents), "clip bound never hit")
  }
}
