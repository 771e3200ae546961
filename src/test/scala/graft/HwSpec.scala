package graft

import graft.queries.Holt

/** forecast_hw contracts: the state path equals an independent
  * BigInt replay of the Winters additive recursion, and the horizon
  * extrapolation uses the right seasonal slots.
  */
class HwSpec extends SparkSuite {

  test("forecast_hw equals an independent BigInt replay") {
    val M = BigInt(1000000)
    val perDay = graft.core.Tables.events(spark, sfDir)
      .selectExpr("ts DIV 86400000000000 AS day").collect()
      .map(_.getLong(0)).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val (d0, d1) = (perDay.keys.min, perDay.keys.max)
    val xs = (d0 to d1).map(dd => dd -> perDay.getOrElse(dd, 0L))
    val a = BigInt(Holt.AlphaMicro); val bq = BigInt(Holt.BetaMicro)
    val g = BigInt(Holt.GammaMicro)
    val m1 = BigInt(xs.take(7).map(_._2).sum) * M / 7
    val m2 = BigInt(xs.slice(7, 14).map(_._2).sum) * M / 7
    var l = m1; var b = (m2 - m1) / 7
    val sArr = Array.tabulate(7)(i => BigInt(xs(i)._2) * M - m1)
    val expect = collection.mutable.Map.empty[Long, (Option[Long], Option[Long], Option[Long], Option[Long])]
    (7 until xs.length).foreach { t =>
      val slot = t % 7
      val (day, x) = xs(t)
      val pred = l + b + sArr(slot)
      val lN = (a * (BigInt(x) * M - sArr(slot)) + (M - a) * (l + b)) / M
      val bN = (bq * (lN - l) + (M - bq) * b) / M
      sArr(slot) = (g * (BigInt(x) * M - lN) + (M - g) * sArr(slot)) / M
      l = lN; b = bN
      expect(day) = (Some(x), Some(l.toLong), Some(b.toLong), Some(pred.toLong))
    }
    val T = xs.length
    (1 to Holt.HorizonDays).foreach { h =>
      expect(d1 + h) = (None, None, None,
        Some((l + h * b + sArr((T - 1 + h) % 7)).toLong))
    }
    val got = Holt.forecastHw(spark, sfDir).collect().map { r =>
      def opt(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
      r.getLong(0) -> (opt(1), opt(2), opt(3), opt(4))
    }.toMap
    assert(got == expect.toMap)
    assert(got.size == xs.length - 7 + Holt.HorizonDays)

    // anomaly flags derive from the same state path: residual = x·1e6
    // − pred, MAD = lower median of |r| (day tie-break), flag at 6×
    val residByDay = (7 until xs.length).map { t =>
      val (day, x) = xs(t)
      val pred = expect(day)._4.get
      day -> (x, pred, BigInt(x) * M - pred)
    }
    val mad = residByDay.map { case (day, (_, _, r)) => (r.abs, day) }
      .sorted.apply((residByDay.length + 1) / 2 - 1)._1
    val expAnom = residByDay.map { case (day, (x, pred, r)) =>
      day -> (x, pred.toLong, r.toLong,
        if (r.abs > BigInt(Holt.AnomalyK) * mad) 1L else 0L)
    }.toMap
    val gotAnom = Holt.forecastHwAnomaly(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(gotAnom == expAnom)
  }
}
