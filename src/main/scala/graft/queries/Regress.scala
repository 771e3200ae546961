package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Multi-feature OLS by closed-form normal equations [EXT] —
  * extendedprice ~ b0 + b1·quantity + b2·discount over lineitem,
  * solved exactly with Cramer's rule on the 3×3 normal-equation
  * system. Complements `agg_regr` (Spark's built-in SINGLE-feature
  * regr_slope/regr_intercept): two regressors need the matrix form,
  * which neither engine ships as an aggregate.
  *
  * Exactness: inputs quantize to integers once per row (quantity,
  * discount in basis points, price in cents), the nine sufficient
  * statistics are integer sums (one map-side-combined aggregate),
  * and the four 3×3 determinants are DECIMAL(38,0) (Spark) ≡
  * HUGEINT (DuckDB) polynomials of those sums — every term ≤1e30,
  * far under both engines' 38-digit ceiling. The only float step is
  * the final decimal→double cast + one division per coefficient —
  * an identical two-op IEEE chain in both engines — then micro
  * rounding.
  *
  * Scale shape: ONE aggregate over the fact table producing a single
  * 9-number row (classic mergeable sufficient statistics — the same
  * pattern a 1000-executor GLM fit uses); everything after is O(1)
  * driver-free scalar algebra in the plan. No shuffle beyond the
  * partial-agg merge.
  */
object Regress {

  def regressMulti(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select(
      expr("CAST(floor(l_quantity + 0.5) AS BIGINT)").as("x1"),
      expr("CAST(floor(l_discount * 10000 + 0.5) AS BIGINT)").as("x2"),
      expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").as("y"))
    val sums = li.agg(
      count(lit(1)).as("n"),
      sum(col("x1")).as("s1"), sum(col("x2")).as("s2"), sum(col("y")).as("sy"),
      sum(col("x1") * col("x1")).as("s11"),
      sum(col("x1") * col("x2")).as("s12"),
      sum(col("x2") * col("x2")).as("s22"),
      sum(col("x1") * col("y")).as("s1y"),
      sum(col("x2") * col("y")).as("s2y"))
    // Cramer on [[n s1 s2][s1 s11 s12][s2 s12 s22]] · b = [sy s1y s2y]
    val dec = Seq("n", "s1", "s2", "sy", "s11", "s12", "s22", "s1y", "s2y")
      .map(c => col(c).cast("decimal(38,0)").as(c))
    sums.select(dec: _*).selectExpr(
      "CAST(n AS BIGINT) AS n",
      """n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2)
         + s2*(s1*s12 - s11*s2) AS det""",
      """sy*(s11*s22 - s12*s12) - s1*(s1y*s22 - s12*s2y)
         + s2*(s1y*s12 - s11*s2y) AS det0""",
      """n*(s1y*s22 - s12*s2y) - sy*(s1*s22 - s12*s2)
         + s2*(s1*s2y - s1y*s2) AS det1""",
      """n*(s11*s2y - s1y*s12) - s1*(s1*s2y - s1y*s2)
         + sy*(s1*s12 - s11*s2) AS det2""")
      .selectExpr(
        "n",
        "CAST(floor(CAST(det0 AS DOUBLE) / CAST(det AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS b0_micro",
        "CAST(floor(CAST(det1 AS DOUBLE) / CAST(det AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS b1_micro",
        "CAST(floor(CAST(det2 AS DOUBLE) / CAST(det AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS b2_micro")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "regress_multi" -> regressMulti)

  def oracleSql: Map[String, String] = Map(
    "regress_multi" ->
      """WITH r AS (
        |  SELECT CAST(floor(l_quantity + 0.5) AS BIGINT) AS x1,
        |         CAST(floor(l_discount * 10000 + 0.5) AS BIGINT) AS x2,
        |         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
        |  FROM lineitem),
        |s AS (
        |  SELECT CAST(count(*) AS HUGEINT) AS n,
        |    CAST(sum(x1) AS HUGEINT) AS s1, CAST(sum(x2) AS HUGEINT) AS s2,
        |    CAST(sum(y) AS HUGEINT) AS sy,
        |    CAST(sum(x1*x1) AS HUGEINT) AS s11,
        |    CAST(sum(x1*x2) AS HUGEINT) AS s12,
        |    CAST(sum(x2*x2) AS HUGEINT) AS s22,
        |    CAST(sum(x1*y) AS HUGEINT) AS s1y,
        |    CAST(sum(x2*y) AS HUGEINT) AS s2y
        |  FROM r),
        |d AS (
        |  SELECT CAST(n AS BIGINT) AS n,
        |    n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2)
        |      + s2*(s1*s12 - s11*s2) AS det,
        |    sy*(s11*s22 - s12*s12) - s1*(s1y*s22 - s12*s2y)
        |      + s2*(s1y*s12 - s11*s2y) AS det0,
        |    n*(s1y*s22 - s12*s2y) - sy*(s1*s22 - s12*s2)
        |      + s2*(s1*s2y - s1y*s2) AS det1,
        |    n*(s11*s2y - s1y*s12) - s1*(s1*s2y - s1y*s2)
        |      + sy*(s1*s12 - s11*s2) AS det2
        |  FROM s)
        |SELECT n,
        |  CAST(floor(CAST(det0 AS DOUBLE) / CAST(det AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS b0_micro,
        |  CAST(floor(CAST(det1 AS DOUBLE) / CAST(det AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS b1_micro,
        |  CAST(floor(CAST(det2 AS DOUBLE) / CAST(det AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS b2_micro
        |FROM d""".stripMargin)
}
