package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.core.Tables

/** Statistical-analysis operators ([EXT]): Kaplan-Meier time-to-event
  * with right-censoring, a chi-square independence readout for
  * categorical A/B outcomes (the complement of ab_test_readout's
  * z-test on means), and an exact-moment Pearson correlation matrix.
  *
  * All three follow the repo's cross-engine exactness conventions:
  * counts stay integers, second moments accumulate in DECIMAL(38,0)
  * (merge-order independent), and every float is either a single
  * correctly-rounded IEEE chain over exact integers or an explicitly
  * ordered fold — so each query carries a full DuckDB hash oracle.
  */
object Stats {

  /** Kaplan-Meier estimator (Kaplan & Meier '58) over
    * time-to-first-purchase: per user, duration = epoch-days from
    * first event to first `purchase` event; users who never purchase
    * are right-censored at their last observed day. The survival
    * curve S(t) = Π_{t_i ≤ t} (1 − d_i/n_i) is emitted at each
    * conversion day with the at-risk count.
    *
    * Scale shape: the per-user pass is one groupBy(user) min/max —
    * a single shuffle of (user, day) cells. Everything after operates
    * on per-DURATION cells, bounded by the observation window's day
    * count (calendar-bounded, independent of data size), so the
    * global-order window and the K-step product fold are O(days),
    * not O(rows). The product is an explicitly ordered foldLeft over
    * the day-sorted factor list — the same IEEE multiply sequence the
    * oracle's recursive CTE runs, so S(t) is bit-identical without
    * rounding.
    */
  def survivalKm(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), expr("ts DIV 1000000000 DIV 86400").as("day"),
        col("event_type"))
    val life = ev.groupBy("user_id").agg(
      min("day").as("d0"),
      min(when(col("event_type") === "purchase", col("day"))).as("dp"),
      max("day").as("dlast"))
      .select(
        when(col("dp").isNotNull, col("dp") - col("d0"))
          .otherwise(col("dlast") - col("d0")).as("dur"),
        when(col("dp").isNotNull, lit(1L)).otherwise(lit(0L)).as("converted"))
    val tot = life.agg(count(lit(1)).as("n_tot"))
    val cells = life.groupBy("dur").agg(
      sum("converted").as("d"),
      sum(lit(1L) - col("converted")).as("c"))
    val prior = Window.orderBy("dur")
      .rowsBetween(Window.unboundedPreceding, -1)
    val run = Window.orderBy("dur")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells.crossJoin(broadcast(tot))
      .withColumn("n_risk",
        col("n_tot") - coalesce(sum(col("d") + col("c")).over(prior), lit(0L)))
      .filter(col("d") > 0)
      .withColumn("f",
        (col("n_risk") - col("d")).cast("double") / col("n_risk").cast("double"))
      .withColumn("surv_noconv",
        aggregate(collect_list("f").over(run), lit(1.0d), (acc, x) => acc * x))
      .select(col("dur").as("t_days"), col("n_risk"), col("d").as("d_conv"),
        col("surv_noconv"))
  }

  /** Chi-square test of independence on the arm × event_type
    * contingency table (arm = user_id parity, the ab_test_readout
    * assignment). Observed counts are exact integers; each cell's
    * expected value and (o−e)²/e contribution is a correctly-rounded
    * IEEE chain over those integers, the contribution is floor-
    * quantized to micro-units, and the statistic is the EXACT integer
    * sum of quantized contributions — merge-order independent, so the
    * whole readout (cells + repeated chi2/dof columns) hash-matches
    * across engines. Cells are bounded by |arms|·|event types|, so the
    * global windows are O(1).
    */
  def abTestChi2(s: SparkSession, d: String): DataFrame = {
    val cells = Tables.events(s, d)
      .select((col("user_id") % 2).as("arm"), col("event_type"))
      .groupBy("arm", "event_type").agg(count(lit(1)).as("o"))
    val armW = Window.partitionBy("arm")
    val typeW = Window.partitionBy("event_type")
    val allW = Window.partitionBy()
    val e = col("rt").cast("double") * col("ct").cast("double") /
      col("n").cast("double")
    cells
      .withColumn("rt", sum("o").over(armW))
      .withColumn("ct", sum("o").over(typeW))
      .withColumn("n", sum("o").over(allW))
      .withColumn("e_micro", floor(e * 1000000 + lit(0.5)).cast("long"))
      .withColumn("contrib_micro",
        floor((col("o").cast("double") - e) * (col("o").cast("double") - e) / e
          * 1000000 + lit(0.5)).cast("long"))
      .withColumn("chi2_micro", sum("contrib_micro").over(allW))
      .withColumn("dof",
        (size(collect_set("arm").over(allW)) - 1).cast("long") *
          (size(collect_set("event_type").over(allW)) - 1).cast("long"))
      .select("arm", "event_type", "o", "e_micro", "contrib_micro",
        "chi2_micro", "dof")
  }

  private val CorrCols: Seq[(String, Column)] = Seq(
    "quantity" -> floor(col("l_quantity") + lit(0.5)).cast("long"),
    "extendedprice" -> floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long"),
    "discount" -> floor(col("l_discount") * 100 + lit(0.5)).cast("long"),
    "tax" -> floor(col("l_tax") * 100 + lit(0.5)).cast("long"))

  /** Pairwise Pearson correlation matrix over lineitem's numeric
    * columns, with EXACT moment accumulation: each column is
    * quantized to its natural integer unit (whole quantities, price
    * cents, discount/tax percent), and all first/second moments are
    * DECIMAL(38,0) sums — associative, overflow-safe to ~1e38, and
    * identical to DuckDB's HUGEINT sums. The final
    * (n·Σxy − ΣxΣy)/√(n·Σx²−(Σx)²)/√(n·Σy²−(Σy)²) runs on exact
    * integers converted once to double, so the quantized output is
    * engine-stable. One aggregation pass produces every moment; the
    * pair reshape is driver-free column surgery on the 1-row frame.
    * (At ~1e12 rows the n·Σx² product approaches the 38-digit rail —
    * shift to per-partition mean-centered accumulation there.)
    */
  def corrMatrix(s: SparkSession, d: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val base = Tables.lineitem(s, d)
      .select(CorrCols.map { case (n, c) => c.as(n) }: _*)
    val firsts = CorrCols.map { case (n, _) =>
      sum(col(n).cast(dec)).as(s"s_$n") }
    val seconds = for {
      (i, idxA) <- CorrCols.map(_._1).zipWithIndex
      (j, idxB) <- CorrCols.map(_._1).zipWithIndex if idxA <= idxB
    } yield sum(col(i).cast(dec) * col(j).cast(dec)).as(s"s_${i}_$j")
    val aggd = base.agg(count(lit(1)).cast(dec).as("n"),
      (firsts ++ seconds): _*)
    // one aggregation pass; the 6 pair rows are an explode over the
    // single moment row, not 6 re-aggregations of the scan
    val pairs = for {
      (a, idxA) <- CorrCols.map(_._1).zipWithIndex
      (b, idxB) <- CorrCols.map(_._1).zipWithIndex if idxA < idxB
    } yield {
      val num = (col("n") * col(s"s_${a}_$b") - col(s"s_$a") * col(s"s_$b"))
        .cast("double")
      val da = (col("n") * col(s"s_${a}_$a") - col(s"s_$a") * col(s"s_$a"))
        .cast("double")
      val db = (col("n") * col(s"s_${b}_$b") - col(s"s_$b") * col(s"s_$b"))
        .cast("double")
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        col("n").cast("long").as("n"),
        (floor(num / (sqrt(da) * sqrt(db)) * 1000000 + lit(0.5)) / 1000000.0)
          .as("corr"))
    }
    aggd.select(explode(array(pairs: _*)).as("p")).select("p.*")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "survival_km" -> survivalKm,
    "ab_test_chi2" -> abTestChi2,
    "corr_matrix" -> corrMatrix)

  def oracleSql: Map[String, String] = Map(
    "survival_km" ->
      """WITH RECURSIVE life AS (
        |  SELECT user_id,
        |    CASE WHEN min(CASE WHEN event_type = 'purchase'
        |                  THEN CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT) END) IS NOT NULL
        |         THEN min(CASE WHEN event_type = 'purchase'
        |                  THEN CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT) END)
        |              - min(CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT))
        |         ELSE max(CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT))
        |              - min(CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT)) END AS dur,
        |    CASE WHEN min(CASE WHEN event_type = 'purchase' THEN ts END) IS NOT NULL
        |         THEN 1 ELSE 0 END AS converted
        |  FROM events GROUP BY user_id),
        |tot AS (SELECT count(*) AS n_tot FROM life),
        |cells AS (
        |  SELECT dur, CAST(sum(converted) AS BIGINT) AS d,
        |    CAST(sum(1 - converted) AS BIGINT) AS c
        |  FROM life GROUP BY dur),
        |risk AS (
        |  SELECT dur, d,
        |    (SELECT n_tot FROM tot)
        |      - COALESCE(sum(d + c) OVER (ORDER BY dur
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
        |  FROM cells),
        |ev AS (
        |  SELECT row_number() OVER (ORDER BY dur) AS rn, dur, d,
        |    CAST(n_risk AS BIGINT) AS n_risk,
        |    CAST(n_risk - d AS DOUBLE) / CAST(n_risk AS DOUBLE) AS f
        |  FROM risk WHERE d > 0),
        |km AS (
        |  SELECT rn, dur, d, n_risk, f AS surv FROM ev WHERE rn = 1
        |  UNION ALL
        |  SELECT ev.rn, ev.dur, ev.d, ev.n_risk, km.surv * ev.f
        |  FROM km JOIN ev ON ev.rn = km.rn + 1)
        |SELECT dur AS t_days, n_risk, d AS d_conv, surv AS surv_noconv
        |FROM km""".stripMargin,
    "ab_test_chi2" ->
      """WITH cells AS (
        |  SELECT user_id % 2 AS arm, event_type, count(*) AS o
        |  FROM events GROUP BY 1, 2),
        |ext AS (
        |  SELECT arm, event_type, o,
        |    CAST(sum(o) OVER (PARTITION BY arm) AS DOUBLE) AS rt,
        |    CAST(sum(o) OVER (PARTITION BY event_type) AS DOUBLE) AS ct,
        |    CAST(sum(o) OVER () AS DOUBLE) AS n,
        |    (SELECT count(DISTINCT arm) FROM cells) AS n_arms,
        |    (SELECT count(DISTINCT event_type) FROM cells) AS n_types
        |  FROM cells),
        |contrib AS (
        |  SELECT arm, event_type, o,
        |    CAST(floor(rt * ct / n * 1000000 + 0.5) AS BIGINT) AS e_micro,
        |    CAST(floor((CAST(o AS DOUBLE) - rt * ct / n)
        |      * (CAST(o AS DOUBLE) - rt * ct / n) / (rt * ct / n)
        |      * 1000000 + 0.5) AS BIGINT) AS contrib_micro,
        |    (n_arms - 1) * (n_types - 1) AS dof
        |  FROM ext)
        |SELECT arm, event_type, o, e_micro, contrib_micro,
        |  CAST(sum(contrib_micro) OVER () AS BIGINT) AS chi2_micro, dof
        |FROM contrib""".stripMargin,
    "corr_matrix" -> {
      val q = Map(
        "quantity" -> "CAST(floor(l_quantity + 0.5) AS HUGEINT)",
        "extendedprice" -> "CAST(floor(l_extendedprice * 100 + 0.5) AS HUGEINT)",
        "discount" -> "CAST(floor(l_discount * 100 + 0.5) AS HUGEINT)",
        "tax" -> "CAST(floor(l_tax * 100 + 0.5) AS HUGEINT)")
      val names = Seq("quantity", "extendedprice", "discount", "tax")
      val moments =
        (names.map(n => s"sum(${q(n)}) AS s_$n") ++
          (for {
            (a, i) <- names.zipWithIndex
            (b, j) <- names.zipWithIndex if i <= j
          } yield s"sum(${q(a)} * ${q(b)}) AS s_${a}_$b")).mkString(",\n    ")
      val arms = (for {
        (a, i) <- names.zipWithIndex
        (b, j) <- names.zipWithIndex if i < j
      } yield
        s"""SELECT '$a' AS col_a, '$b' AS col_b, CAST(n AS BIGINT) AS n,
           |  floor(CAST(n * s_${a}_$b - s_$a * s_$b AS DOUBLE)
           |    / (sqrt(CAST(n * s_${a}_$a - s_$a * s_$a AS DOUBLE))
           |       * sqrt(CAST(n * s_${b}_$b - s_$b * s_$b AS DOUBLE)))
           |    * 1000000 + 0.5) / 1000000.0 AS corr
           |FROM m""".stripMargin).mkString("\nUNION ALL\n")
      s"""WITH m AS (
         |  SELECT CAST(count(*) AS HUGEINT) AS n,
         |    $moments
         |  FROM lineitem)
         |$arms""".stripMargin
    })
}
