package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Holt's linear-trend exponential smoothing ([EXT]) over the daily
  * event-count series (Holt '57): per observed day the smoothed
  * level/trend state and the one-step-ahead prediction, plus a
  * 7-day horizon extrapolation — the trend-aware upgrade of
  * forecast_baseline's seasonal mean.
  *
  * Exactness: the recursion is integer micro arithmetic —
  * l_t = (α·x_t·1e6 + (1e6−α)(l+b)) div 1e6,
  * b_t = (β(l_t−l_{t−1}) + (1e6−β)b) div 1e6 — truncation identical
  * in both engines (negative trends included), so the whole state
  * path hash-matches the oracle's recursive CTE.
  *
  * Scale shape: the distributed work is the one groupBy(day) corpus
  * pass; the smoothing recursion is inherently sequential, runs on
  * the CALENDAR-bounded cell list in the driver (the kmeans/markov
  * bounded-collect convention — 10 years of days is 3,653 rows
  * regardless of corpus size), and returns one row per day.
  */
object Holt {

  /** Level smoothing α in micro (0.3). */
  val AlphaMicro = 300000L
  /** Trend smoothing β in micro (0.1). */
  val BetaMicro = 100000L
  /** Forecast horizon in days. */
  val HorizonDays = 7

  def forecastHolt(s: SparkSession, d: String): DataFrame = {
    val M = 1000000L
    val perDay = Tables.events(s, d)
      .select(expr("ts DIV 86400000000000").as("day"))
      .groupBy("day").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (d0, d1) = (perDay.keys.min, perDay.keys.max)
    val xs = (d0 to d1).map(dd => dd -> perDay.getOrElse(dd, 0L))
    // init: level = first value, trend = first difference (standard)
    var l = xs(0)._2 * M
    var b = (xs(1)._2 - xs(0)._2) * M
    val rows = scala.collection.mutable.ArrayBuffer.empty[
      (Long, Option[Long], Option[Long], Option[Long], Option[Long])]
    rows += ((xs(0)._1, Some(xs(0)._2), Some(l), Some(b), None))
    xs.drop(1).foreach { case (day, x) =>
      val pred = l + b
      val lNew = (AlphaMicro * x * M + (M - AlphaMicro) * (l + b)) / M
      val bNew = (BetaMicro * (lNew - l) + (M - BetaMicro) * b) / M
      l = lNew; b = bNew
      rows += ((day, Some(x), Some(l), Some(b), Some(pred)))
    }
    (1 to HorizonDays).foreach { h =>
      rows += ((d1 + h, None, None, None, Some(l + h * b)))
    }
    val sess = s
    import sess.implicits._
    rows.toSeq.toDF("day", "x", "level_micro", "trend_micro", "pred_micro")
  }

  /** Seasonal smoothing γ in micro (0.2). */
  val GammaMicro = 200000L
  /** Holt-Winters season length (weekly pattern on daily counts). */
  val SeasonLen = 7

  /** Holt-Winters ADDITIVE triple exponential smoothing (Winters '60)
    * over the daily series — the seasonal upgrade of [[forecastHolt]]:
    * level/trend as in Holt plus a 7-slot additive seasonal state.
    * Standard init from the first two weeks (level = week-1 mean,
    * trend = (week-2 mean − week-1 mean)/7, seasonal = week-1
    * residuals); smoothing runs from day 8. Forecast h days out:
    * l + h·b + s[(T−1+h) mod 7].
    *
    * Exactness + scale: same contract as forecast_holt — the whole
    * recursion is integer micro arithmetic (DIV truncation identical
    * in both engines), distributed work is the one groupBy(day)
    * pass, and the sequential state path runs over the
    * calendar-bounded day list (driver-side, kmeans bounded-collect
    * convention); the oracle carries the 7-slot seasonal vector as a
    * LIST column through a recursive CTE.
    */
  def forecastHw(s: SparkSession, d: String): DataFrame = {
    val M = 1000000L
    val perDay = Tables.events(s, d)
      .select(expr("ts DIV 86400000000000").as("day"))
      .groupBy("day").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (d0, d1) = (perDay.keys.min, perDay.keys.max)
    val xs = (d0 to d1).map(dd => dd -> perDay.getOrElse(dd, 0L))
    require(xs.length >= 2 * SeasonLen, "need two full seasons to initialize")
    val m1 = xs.take(SeasonLen).map(_._2).sum * M / SeasonLen
    val m2 = xs.slice(SeasonLen, 2 * SeasonLen).map(_._2).sum * M / SeasonLen
    var l = m1
    var b = (m2 - m1) / SeasonLen
    val sArr = Array.tabulate(SeasonLen)(i => xs(i)._2 * M - m1)
    val rows = scala.collection.mutable.ArrayBuffer.empty[
      (Long, Option[Long], Option[Long], Option[Long], Option[Long])]
    (SeasonLen until xs.length).foreach { t =>
      val slot = t % SeasonLen
      val (day, x) = xs(t)
      val pred = l + b + sArr(slot)
      val lNew = (AlphaMicro * (x * M - sArr(slot)) + (M - AlphaMicro) * (l + b)) / M
      val bNew = (BetaMicro * (lNew - l) + (M - BetaMicro) * b) / M
      sArr(slot) = (GammaMicro * (x * M - lNew) + (M - GammaMicro) * sArr(slot)) / M
      l = lNew; b = bNew
      rows += ((day, Some(x), Some(l), Some(b), Some(pred)))
    }
    val T = xs.length
    (1 to HorizonDays).foreach { h =>
      rows += ((d1 + h, None, None, None,
        Some(l + h * b + sArr((T - 1 + h) % SeasonLen))))
    }
    val sess = s
    import sess.implicits._
    rows.toSeq.toDF("day", "x", "level_micro", "trend_micro", "pred_micro")
  }

  /** Anomaly threshold: |residual| > AnomalyK · MAD. */
  val AnomalyK = 6L

  /** Forecast-residual anomaly days — what a forecast is FOR: flag
    * days whose Holt-Winters one-step prediction error exceeds
    * [[AnomalyK]]× the (lower-)median absolute residual. Seasonal-
    * and trend-aware where anomaly_seasonal's hour-profile screen is
    * not; all integer (the MAD is an order statistic of integer
    * residuals with a day tie-break).
    */
  def forecastHwAnomaly(s: SparkSession, d: String): DataFrame = {
    val M = 1000000L
    val perDay = Tables.events(s, d)
      .select(expr("ts DIV 86400000000000").as("day"))
      .groupBy("day").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (d0, d1) = (perDay.keys.min, perDay.keys.max)
    val xs = (d0 to d1).map(dd => dd -> perDay.getOrElse(dd, 0L))
    require(xs.length >= 2 * SeasonLen, "need two full seasons to initialize")
    val m1 = xs.take(SeasonLen).map(_._2).sum * M / SeasonLen
    val m2 = xs.slice(SeasonLen, 2 * SeasonLen).map(_._2).sum * M / SeasonLen
    var l = m1
    var b = (m2 - m1) / SeasonLen
    val sArr = Array.tabulate(SeasonLen)(i => xs(i)._2 * M - m1)
    val res = (SeasonLen until xs.length).map { t =>
      val slot = t % SeasonLen
      val (day, x) = xs(t)
      val pred = l + b + sArr(slot)
      val lNew = (AlphaMicro * (x * M - sArr(slot)) + (M - AlphaMicro) * (l + b)) / M
      val bNew = (BetaMicro * (lNew - l) + (M - BetaMicro) * b) / M
      sArr(slot) = (GammaMicro * (x * M - lNew) + (M - GammaMicro) * sArr(slot)) / M
      l = lNew; b = bNew
      (day, x, pred, x * M - pred)
    }
    val mad = res.map(r => (math.abs(r._4), r._1))
      .sorted.apply((res.length + 1) / 2 - 1)._1
    val sess = s
    import sess.implicits._
    res.map { case (day, x, pred, r) =>
      (day, x, pred, r, if (math.abs(r) > AnomalyK * mad) 1L else 0L)
    }.toDF("day", "x", "pred_micro", "resid_micro", "is_anomaly")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "forecast_holt" -> forecastHolt,
    "forecast_hw" -> forecastHw,
    "forecast_hw_anomaly" -> forecastHwAnomaly)

  private def hwCtes: String =
    s"""per_day AS (
         |  SELECT CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT)
         |    AS day, count(*) AS c
         |  FROM events GROUP BY 1),
         |spine AS (
         |  SELECT unnest(generate_series((SELECT min(day) FROM per_day),
         |                                (SELECT max(day) FROM per_day))) AS day),
         |series AS (
         |  SELECT s.day, CAST(coalesce(p.c, 0) AS BIGINT) AS x,
         |    row_number() OVER (ORDER BY s.day) AS rn
         |  FROM spine s LEFT JOIN per_day p ON p.day = s.day),
         |init AS (
         |  SELECT
         |    CAST((SELECT sum(x) FROM series WHERE rn <= $SeasonLen)
         |      * 1000000 // $SeasonLen AS BIGINT) AS m1,
         |    CAST((SELECT sum(x) FROM series
         |            WHERE rn > $SeasonLen AND rn <= ${2 * SeasonLen})
         |      * 1000000 // $SeasonLen AS BIGINT) AS m2),
         |hw(rn, day, x, l, b, sarr, pred) AS (
         |  SELECT $SeasonLen,
         |    (SELECT day FROM series WHERE rn = $SeasonLen),
         |    CAST(NULL AS BIGINT), m1, (m2 - m1) // $SeasonLen,
         |    (SELECT list(x * 1000000 - m1 ORDER BY rn)
         |       FROM series WHERE rn <= $SeasonLen),
         |    CAST(NULL AS BIGINT)
         |  FROM init
         |  UNION ALL
         |  SELECT rn, day, x, l,
         |    ($BetaMicro * (l - lprev)
         |      + ${1000000 - BetaMicro} * bprev) // 1000000 AS b,
         |    list_transform(sprev, (v, i) ->
         |      CASE WHEN i = (rn - 1) % $SeasonLen + 1
         |        THEN ($GammaMicro * (x * 1000000 - l)
         |              + ${1000000 - GammaMicro} * v) // 1000000
         |        ELSE v END),
         |    pred
         |  FROM (
         |    SELECT h.rn + 1 AS rn, e.day, e.x,
         |      h.l AS lprev, h.b AS bprev, h.sarr AS sprev,
         |      h.l + h.b + h.sarr[h.rn % $SeasonLen + 1] AS pred,
         |      ($AlphaMicro * (e.x * 1000000 - h.sarr[h.rn % $SeasonLen + 1])
         |        + ${1000000 - AlphaMicro} * (h.l + h.b)) // 1000000 AS l
         |    FROM hw h JOIN series e ON e.rn = h.rn + 1))""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "forecast_holt" ->
      s"""WITH RECURSIVE per_day AS (
         |  SELECT CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT)
         |    AS day, count(*) AS c
         |  FROM events GROUP BY 1),
         |spine AS (
         |  SELECT unnest(generate_series((SELECT min(day) FROM per_day),
         |                                (SELECT max(day) FROM per_day))) AS day),
         |series AS (
         |  SELECT s.day, CAST(coalesce(p.c, 0) AS BIGINT) AS x,
         |    row_number() OVER (ORDER BY s.day) AS rn
         |  FROM spine s LEFT JOIN per_day p ON p.day = s.day),
         |holt(rn, day, x, l, b, pred) AS (
         |  SELECT a.rn, a.day, a.x, a.x * 1000000,
         |    (SELECT x FROM series WHERE rn = 2) * 1000000 - a.x * 1000000,
         |    CAST(NULL AS BIGINT)
         |  FROM series a WHERE a.rn = 1
         |  UNION ALL
         |  SELECT s.rn, s.day, s.x,
         |    ($AlphaMicro * s.x * 1000000
         |      + ${1000000 - AlphaMicro} * (h.l + h.b)) // 1000000,
         |    ($BetaMicro * (($AlphaMicro * s.x * 1000000
         |        + ${1000000 - AlphaMicro} * (h.l + h.b)) // 1000000 - h.l)
         |      + ${1000000 - BetaMicro} * h.b) // 1000000,
         |    h.l + h.b
         |  FROM holt h JOIN series s ON s.rn = h.rn + 1),
         |last AS (SELECT day, l, b FROM holt
         |         WHERE rn = (SELECT max(rn) FROM holt))
         |SELECT day, x, l AS level_micro, b AS trend_micro,
         |  pred AS pred_micro
         |FROM holt
         |UNION ALL
         |SELECT last.day + h.h, NULL, NULL, NULL, last.l + h.h * last.b
         |FROM last CROSS JOIN
         |  (SELECT unnest(generate_series(1, $HorizonDays)) AS h) h""".stripMargin,
    "forecast_hw" ->
      s"""WITH RECURSIVE $hwCtes,
         |fin AS (SELECT rn, day, l, b, sarr FROM hw
         |        WHERE rn = (SELECT max(rn) FROM hw))
         |SELECT day, x, l AS level_micro, b AS trend_micro,
         |  pred AS pred_micro
         |FROM hw WHERE rn > $SeasonLen
         |UNION ALL
         |SELECT fin.day + h.h, NULL, NULL, NULL,
         |  fin.l + h.h * fin.b + fin.sarr[(fin.rn - 1 + h.h) % $SeasonLen + 1]
         |FROM fin CROSS JOIN
         |  (SELECT unnest(generate_series(1, $HorizonDays)) AS h) h""".stripMargin,
    "forecast_hw_anomaly" ->
      s"""WITH RECURSIVE $hwCtes,
         |res AS (
         |  SELECT day, x, pred AS pred_micro,
         |    x * 1000000 - pred AS resid_micro
         |  FROM hw WHERE rn > $SeasonLen),
         |ranked AS (
         |  SELECT abs(resid_micro) AS ar,
         |    row_number() OVER (ORDER BY abs(resid_micro), day) AS rk,
         |    count(*) OVER () AS n
         |  FROM res),
         |mad AS (SELECT CAST(ar AS BIGINT) AS mad FROM ranked
         |        WHERE rk = (n + 1) // 2)
         |SELECT day, x, pred_micro, resid_micro,
         |  CAST(CASE WHEN abs(resid_micro) > $AnomalyK * mad.mad
         |    THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
         |FROM res CROSS JOIN mad""".stripMargin)
}
