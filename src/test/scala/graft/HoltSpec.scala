package graft

import graft.queries.Holt
import org.apache.spark.sql.functions._

/** Holt smoothing contracts: the state path equals the sequential
  * recursion, one-step predictions lag the state by construction,
  * and the horizon rows extrapolate linearly. Cross-engine hashes
  * live under the DuckDB gate.
  */
class HoltSpec extends SparkSuite {

  test("forecast_holt equals the sequential recursion and extrapolates") {
    val M = 1000000L
    val days = graft.core.Tables.events(spark, sfDir)
      .select(expr("ts DIV 86400000000000").as("day")).collect()
      .map(_.getLong(0))
    val counts = days.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val (d0, d1) = (days.min, days.max)
    val xs = (d0 to d1).map(dd => counts.getOrElse(dd, 0L))
    val got = Holt.forecastHolt(spark, sfDir).collect().map { r =>
      (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))
    }.sortBy(_._1)
    assert(got.length == xs.length + Holt.HorizonDays)
    var l = xs(0) * M
    var b = (xs(1) - xs(0)) * M
    assert(got(0) == ((d0, Some(xs(0)), Some(l), Some(b), None)))
    xs.indices.drop(1).foreach { i =>
      val pred = l + b
      val lNew = (Holt.AlphaMicro * xs(i) * M
        + (M - Holt.AlphaMicro) * (l + b)) / M
      b = (Holt.BetaMicro * (lNew - l) + (M - Holt.BetaMicro) * b) / M
      l = lNew
      assert(got(i) == ((d0 + i, Some(xs(i)), Some(l), Some(b), Some(pred))),
        s"day ${d0 + i}")
    }
    (1 to Holt.HorizonDays).foreach { h =>
      assert(got(xs.length + h - 1) ==
        ((d1 + h, None, None, None, Some(l + h * b))), s"horizon $h")
    }
  }
}
