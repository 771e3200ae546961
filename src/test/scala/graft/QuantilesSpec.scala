package graft

import graft.queries.Stats

/** quantiles_exact contracts: values equal the sequential type-7
  * (h = (n−1)p, linear interpolation) computation to float
  * tolerance, and the quartiles are ordered.
  */
class QuantilesSpec extends SparkSuite {

  private def q7(sorted: Array[Double], p: Double): Double = {
    val h = (sorted.length - 1) * p
    val lo = math.floor(h).toInt; val hi = math.ceil(h).toInt
    sorted(lo) + (h - lo) * (sorted(hi) - sorted(lo))
  }

  test("quantiles_exact equals the sequential type-7 computation") {
    val byType = graft.core.Tables.events(spark, sfDir)
      .select("event_type", "value").collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val got = Stats.quantilesExact(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(got.keySet == byType.keySet)
    byType.foreach { case (et, vs) =>
      val (n, p25, p50, p75, p95) = got(et)
      assert(n == vs.length.toLong)
      def close(a: Double, b: Double) = math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(a))
      assert(close(p25, q7(vs, 0.25)), s"$et p25")
      assert(close(p50, q7(vs, 0.50)), s"$et p50")
      assert(close(p75, q7(vs, 0.75)), s"$et p75")
      assert(close(p95, q7(vs, 0.95)), s"$et p95")
      assert(p25 <= p50 && p50 <= p75 && p75 <= p95)
    }
  }
}
