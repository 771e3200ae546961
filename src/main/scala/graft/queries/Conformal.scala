package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.core.Tables

/** Split-conformal prediction interval ([EXT]) — Vovk et al. /
  * Lei et al.'s distribution-free interval around a simple OLS model
  * (order total ~ line count): fit on the train split, take the
  * ⌈(n_cal+1)(1−α)⌉-th smallest absolute residual on the calibration
  * split as the interval half-width q̂, and report empirical coverage
  * on the held-out eval split. α = 0.1.
  *
  * Exactness: OLS moments accumulate in DECIMAL(38,0); slope and
  * intercept are truncated integer-micro ratios (`div` ≡ `//`);
  * residuals are integer micro-cents; q̂ is an exact order statistic
  * picked by (residual, order id) rank. The md5-mod-3 split is the
  * repo's shard-key convention — reproducible anywhere.
  *
  * Scale shape: one join + aggregation for moments, one |cal|-row
  * global rank for q̂ (a top-k-free exact selection — at 100 TB swap
  * the single-partition rank window for the quantile_sketch two-pass
  * or a count-below binary search; cal splits are sized to make the
  * window input bounded), one map-side coverage count. Single-row
  * output.
  */
object Conformal {

  /** Interval miss rate α in per-mille (100 = 90% target coverage). */
  val AlphaPermille = 100L

  private def splitOf(idCol: org.apache.spark.sql.Column) =
    pmod(conv(substring(md5(concat(lit("cfi:"), idCol.cast("string"))), 1, 6),
      16, 10).cast("long"), lit(3L))

  def conformalInterval(s: SparkSession, d: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val pts = Tables.orders(s, d)
      .join(Tables.lineitem(s, d).groupBy("l_orderkey")
        .agg(count(lit(1)).as("x")), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderkey").as("id"), col("x"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("y"),
        splitOf(col("o_orderkey")).as("sp"))
    val m = pts.filter(col("sp") === 0).agg(
      count(lit(1)).cast(dec).as("n"),
      sum(col("x").cast(dec)).as("sx"),
      sum(col("y").cast(dec)).as("sy"),
      sum((col("x") * col("y")).cast(dec)).as("sxy"),
      sum((col("x") * col("x")).cast(dec)).as("sxx"))
    val fit = m.select(
      col("n").cast("long").as("n_train"),
      expr("((n * sxy - sx * sy) * 1000000) div (n * sxx - sx * sx)")
        .cast("long").as("slope_micro"),
      expr("""(sy * 1000000 - ((n * sxy - sx * sy) * 1000000)
          div (n * sxx - sx * sx) * sx) div n""")
        .cast("long").as("intercept_micro"))
    val scored = pts.crossJoin(broadcast(fit))
      .withColumn("resid",
        abs(col("y") * lit(1000000L)
          - (col("slope_micro") * col("x") + col("intercept_micro"))))
    val cal = scored.filter(col("sp") === 1)
    val nCal = cal.agg(count(lit(1)).as("n_cal"))
    // exact order statistic: rank k = ceil((n_cal+1)*(1-alpha)).
    // The rank is a range-partitioned global row number (ScalableRank
    // — no single-partition window over the calibration half); the
    // k-th element itself is an orderBy+limit(1) TakeOrdered on the
    // ≥k tail.
    val qhat = graft.core.ScalableRank
      .rowNumber(cal.select(col("id"), col("resid")), "rk",
        col("resid").asc, col("id").asc)
      .crossJoin(broadcast(nCal)) // 1-row count attachment
      .filter(col("rk") * 1000 >= (col("n_cal") + 1)
        * (1000 - AlphaPermille))
      .orderBy(col("rk").asc).limit(1)
      .select(col("n_cal"), col("resid").as("qhat_micro"))
    scored.filter(col("sp") === 2).crossJoin(broadcast(qhat))
      .agg(count(lit(1)).as("n_eval"),
        sum(when(col("resid") <= col("qhat_micro"), 1L).otherwise(0L))
          .as("covered"),
        first(col("n_cal")).as("n_cal"),
        first(col("qhat_micro")).as("qhat_micro"))
      .crossJoin(broadcast(fit))
      .select(col("n_train"), col("n_cal"), col("n_eval"),
        col("slope_micro"), col("intercept_micro"), col("qhat_micro"),
        col("covered"),
        expr("covered * 1000000L div n_eval").as("coverage_micro"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "conformal_interval" -> conformalInterval)

  def oracleSql: Map[String, String] = Map(
    "conformal_interval" ->
      s"""WITH pts AS MATERIALIZED (
         |  SELECT o.o_orderkey AS id, l.x,
         |    CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS y,
         |    CAST(('0x' || substr(md5('cfi:' ||
         |      CAST(o.o_orderkey AS VARCHAR)), 1, 6))::UBIGINT % 3 AS BIGINT)
         |      AS sp
         |  FROM orders o JOIN (SELECT l_orderkey, count(*) AS x
         |                      FROM lineitem GROUP BY 1) l
         |    ON l.l_orderkey = o.o_orderkey),
         |m AS (
         |  SELECT CAST(count(*) AS HUGEINT) AS n,
         |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
         |    CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
         |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
         |  FROM pts WHERE sp = 0),
         |fit AS (
         |  SELECT CAST(n AS BIGINT) AS n_train,
         |    CAST(((n * sxy - sx * sy) * 1000000) // (n * sxx - sx * sx)
         |      AS BIGINT) AS slope_micro,
         |    CAST((sy * 1000000 - ((n * sxy - sx * sy) * 1000000)
         |        // (n * sxx - sx * sx) * sx) // n AS BIGINT) AS intercept_micro
         |  FROM m),
         |scored AS MATERIALIZED (
         |  SELECT p.id, p.sp,
         |    abs(p.y * 1000000 - (f.slope_micro * p.x + f.intercept_micro))
         |      AS resid
         |  FROM pts p CROSS JOIN fit f),
         |ncal AS (SELECT CAST(count(*) AS BIGINT) AS n_cal
         |         FROM scored WHERE sp = 1),
         |qh AS (
         |  SELECT n_cal, resid AS qhat_micro FROM (
         |    SELECT s.resid, n.n_cal,
         |      row_number() OVER (ORDER BY s.resid, s.id) AS rk
         |    FROM scored s CROSS JOIN ncal n WHERE s.sp = 1)
         |  WHERE rk * 1000 >= (n_cal + 1) * ${1000 - AlphaPermille}
         |  ORDER BY rk LIMIT 1)
         |SELECT f.n_train, q.n_cal, CAST(count(*) AS BIGINT) AS n_eval,
         |  f.slope_micro, f.intercept_micro, q.qhat_micro,
         |  CAST(sum(CASE WHEN s.resid <= q.qhat_micro THEN 1 ELSE 0 END)
         |    AS BIGINT) AS covered,
         |  CAST(sum(CASE WHEN s.resid <= q.qhat_micro THEN 1 ELSE 0 END)
         |    * 1000000 // count(*) AS BIGINT) AS coverage_micro
         |FROM scored s CROSS JOIN qh q CROSS JOIN fit f
         |WHERE s.sp = 2
         |GROUP BY f.n_train, q.n_cal, f.slope_micro, f.intercept_micro,
         |  q.qhat_micro""".stripMargin)
}
