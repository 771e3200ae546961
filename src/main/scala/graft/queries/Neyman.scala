package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** NEYMAN-ALLOCATION stratified sampling [EXT] — the
  * minimum-variance way to spend a fixed sample budget across strata
  * (Neyman '34): allocate ∝ N_h·S_h, so big AND volatile strata get
  * more rows than proportional allocation would give. This is the
  * sampling design behind every serious data-quality audit budget;
  * [[TextOps.stratifiedSample]] is the proportional baseline.
  *
  * Exactness: per-stratum variance comes from DECIMAL(38,0) ≡
  * HUGEINT power sums of cent-quantized values (merge-order free);
  * S_h is one correctly-rounded √; the weight w_h = floor(N_h·S_h)
  * is then integer, and the Hamilton largest-remainder apportionment
  * (the mixture_allocate trick) runs on pure integer quotas —
  * (B·w_h) DIV Σw plus remainder ranking by (B·w_h) MOD Σw — so the
  * allocation sums to the budget EXACTLY in both engines.
  *
  * Scale shape: one power-sum aggregate over the fact table; the
  * apportionment runs on the |strata|-row frame (an unpartitioned
  * window over a dashboard-cardinality set).
  */
object Neyman {

  /** Total sample budget. */
  val Budget = 1000L

  def sampleNeyman(s: SparkSession, d: String): DataFrame = {
    val stats = Tables.events(s, d)
      .select(col("event_type"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("v"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("v").cast("decimal(38,0)")).as("s1"),
        sum((col("v") * col("v")).cast("decimal(38,0)")).as("s2"))
      // sample variance: (n·Σx² − (Σx)²) / (n·(n−1)) — exact rational
      // under the sqrt, one IEEE chain
      .withColumn("sd_micro",
        floor(sqrt((col("n_rows") * col("s2") - col("s1") * col("s1"))
          .cast("double")
          / (col("n_rows") * (col("n_rows") - 1)).cast("double"))
          * 1000000 + lit(0.5)).cast("long"))
      .withColumn("w", expr("CAST(n_rows AS BIGINT) * sd_micro"))
    val tot = stats.agg(sum("w").as("tw"))
    val quotas = stats.crossJoin(broadcast(tot))
      .withColumn("base", expr(s"($Budget * w) DIV tw"))
      .withColumn("rem", expr(s"($Budget * w) % tw"))
    val wr = org.apache.spark.sql.expressions.Window
      .orderBy(col("rem").desc, col("event_type").asc)
    val short = quotas.agg((lit(Budget) - sum("base")).as("short"))
    quotas.crossJoin(broadcast(short))
      .withColumn("rk", row_number().over(wr))
      .select(col("event_type"), col("n_rows"), col("sd_micro"),
        (col("base") + when(col("rk") <= col("short"), 1L).otherwise(0L))
          .as("alloc"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sample_neyman" -> sampleNeyman)

  def oracleSql: Map[String, String] = Map(
    "sample_neyman" ->
      s"""WITH st AS (
         |  SELECT event_type, count(*) AS n_rows,
         |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS HUGEINT)
         |      AS s1,
         |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)
         |           * CAST(floor(value * 100 + 0.5) AS BIGINT)) AS HUGEINT)
         |      AS s2
         |  FROM events GROUP BY 1),
         |sd AS (
         |  SELECT event_type, n_rows,
         |    CAST(floor(sqrt(CAST(n_rows * s2 - s1 * s1 AS DOUBLE)
         |      / CAST(n_rows * (n_rows - 1) AS DOUBLE)) * 1000000 + 0.5)
         |      AS BIGINT) AS sd_micro
         |  FROM st),
         |wt AS (SELECT event_type, n_rows, sd_micro,
         |         n_rows * sd_micro AS w FROM sd),
         |tw AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM wt),
         |q AS (
         |  SELECT event_type, n_rows, sd_micro,
         |    ($Budget * w) // tw.tw AS base, ($Budget * w) % tw.tw AS rem
         |  FROM wt CROSS JOIN tw),
         |sh AS (SELECT $Budget - CAST(sum(base) AS BIGINT) AS short FROM q)
         |SELECT event_type, n_rows, sd_micro,
         |  CAST(base + CASE WHEN row_number() OVER
         |      (ORDER BY rem DESC, event_type ASC) <= sh.short
         |    THEN 1 ELSE 0 END AS BIGINT) AS alloc
         |FROM q CROSS JOIN sh""".stripMargin)
}
