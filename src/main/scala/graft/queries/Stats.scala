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

  /** Exact weighted median of the price distribution per return flag
    * (price cents weighted by whole-unit quantity) — the lower
    * weighted median: the smallest value whose running weight reaches
    * half the total. Deterministic because the running sum is over
    * per-VALUE cells (groupBy value first), never over an arbitrary
    * row order within ties.
    *
    * Scale shape: one groupBy(grp, v) cell pass; the running-sum
    * window runs per group over value cells, and the pick is a
    * rank-1 filter. Value-cell cardinality bounds the window input,
    * not row count. */
  def weightedMedian(s: SparkSession, d: String): DataFrame = {
    val cells = Tables.lineitem(s, d)
      .select(col("l_returnflag").as("grp"),
        floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long").as("v"),
        floor(col("l_quantity") + lit(0.5)).cast("long").as("w"))
      .groupBy("grp", "v").agg(sum("w").as("w"))
    val runW = Window.partitionBy("grp").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val grpW = Window.partitionBy("grp")
    val rkW = Window.partitionBy("grp").orderBy("v")
    cells
      .withColumn("cumw", sum("w").over(runW))
      .withColumn("totw", sum("w").over(grpW))
      .filter(col("cumw") * 2 >= col("totw"))
      .withColumn("rn", row_number().over(rkW))
      .filter(col("rn") === 1)
      .select(col("grp"), col("totw").as("total_weight"),
        col("v").as("median_cents"))
  }

  /** Benford's-law screen over order totals (Benford 1938; the
    * classic first-digit fraud/data-entry check): per leading digit
    * of the integer cent amount, the observed count, the Benford
    * expectation n·log10(1+1/d) in micro, the chi-square term
    * quantized to micro BEFORE summing (integer total, merge-order
    * free). Leading digit extraction goes through the int64's
    * decimal string — engine-stable, no float log in the digit path.
    */
  def benfordScreen(s: SparkSession, d: String): DataFrame = {
    val digits = Tables.orders(s, d)
      .select(substring(floor(col("o_totalprice") * 100 + lit(0.5))
        .cast("long").cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n_obs"))
    val spine = s.range(1, 10).select(col("id").as("digit"))
    val tot = digits.agg(sum("n_obs").as("n"))
    val allW = Window.partitionBy()
    spine.join(digits, Seq("digit"), "left")
      .select(col("digit"), coalesce(col("n_obs"), lit(0L)).as("n_obs"))
      .crossJoin(broadcast(tot))
      .withColumn("exp_d",
        col("n").cast("double") * log10(lit(1.0) + lit(1.0) / col("digit")))
      .withColumn("exp_micro",
        floor(col("exp_d") * 1000000 + lit(0.5)).cast("long"))
      .withColumn("term_micro",
        floor((col("n_obs").cast("double") - col("exp_d"))
          * (col("n_obs").cast("double") - col("exp_d")) / col("exp_d")
          * 1000000 + lit(0.5)).cast("long"))
      .withColumn("chi2_micro", sum("term_micro").over(allW))
      .select("digit", "n_obs", "n", "exp_micro", "term_micro", "chi2_micro")
  }

  /** Difference-in-differences readout ([EXT]) over the event stream:
    * treatment = odd user_id (the ab_test arm convention), period
    * split at the calendar midpoint day, outcome = mean event value.
    * Cell sums are integer cents; the four cell means are
    * floor-quantized to micro-dollars and the DiD estimate
    * (ΔT − ΔC) is pure integer arithmetic on them. One conditional
    * aggregation pass; single-row output. */
  def didReadout(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select((col("user_id") % 2).as("treat"),
        expr("ts DIV 86400000000000").as("day"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("c"))
    val mid = ev.agg(expr("(min(day) + max(day) + 1L) div 2L").as("mid"))
    def cell(t: Int, post: Boolean, f: String) = {
      val m = col("treat") === t &&
        (if (post) col("day") >= col("mid") else col("day") < col("mid"))
      if (f == "n") sum(when(m, 1L).otherwise(0L))
      else sum(when(m, col("c")).otherwise(0L))
    }
    ev.crossJoin(broadcast(mid))
      .agg(cell(1, false, "n").as("n_t_pre"), cell(1, false, "s").as("s_t_pre"),
        cell(1, true, "n").as("n_t_post"), cell(1, true, "s").as("s_t_post"),
        cell(0, false, "n").as("n_c_pre"), cell(0, false, "s").as("s_c_pre"),
        cell(0, true, "n").as("n_c_post"), cell(0, true, "s").as("s_c_post"))
      .select(col("n_t_pre"), col("n_t_post"), col("n_c_pre"), col("n_c_post"),
        expr("s_t_pre * 10000L div n_t_pre").as("m_t_pre_micro"),
        expr("s_t_post * 10000L div n_t_post").as("m_t_post_micro"),
        expr("s_c_pre * 10000L div n_c_pre").as("m_c_pre_micro"),
        expr("s_c_post * 10000L div n_c_post").as("m_c_post_micro"))
      .withColumn("did_micro",
        (col("m_t_post_micro") - col("m_t_pre_micro"))
          - (col("m_c_post_micro") - col("m_c_pre_micro")))
  }

  /** Exact interpolated quantiles (the "type 7" / SQL-standard
    * PERCENTILE_CONT definition h = (n−1)p, linear between order
    * statistics) of event value per event_type — the distribution
    * summary a metrics pipeline publishes next to the mergeable
    * sketch ([[Sketches]] quantile_sketch): the sketch is the 100 TB
    * path, this is the exact ground truth it is audited against.
    * Both engines implement the identical definition (Spark
    * `percentile`, DuckDB `quantile_cont`); the only float step is
    * the two-point interpolation, inside the driver compare's 1e-9
    * relative tolerance.
    *
    * Scale shape: one hash-partition on the (low-cardinality) group
    * key; per-group exact quantiles need the group's values local —
    * acceptable for dashboard-cardinality groups, and precisely why
    * the sketch twin exists for per-user-scale keys.
    */
  def quantilesExact(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        expr("percentile(value, array(0.25D, 0.5D, 0.75D, 0.95D))").as("q"))
      .select(col("event_type"), col("n"),
        element_at(col("q"), 1).as("p25"),
        element_at(col("q"), 2).as("p50"),
        element_at(col("q"), 3).as("p75"),
        element_at(col("q"), 4).as("p95"))

  /** Poisson(1) CDF in micro — inverse-CDF thresholds for the
    * deterministic bootstrap weights (floor(P(X≤k)·1e6)).
    */
  private val PoisCdfMicro = Seq(367879L, 735758L, 919698L, 981011L, 996340L)
  /** Bootstrap resample count. */
  val BootB = 32

  /** Distributed POISSON BOOTSTRAP confidence interval (the
    * Chamandy et al. '12 recipe — the only bootstrap that works on a
    * cluster, since i.i.d. Poisson(1) weights need no global
    * coordination) for the mean event value per event_type:
    * B=32 resamples, each row's weight in resample b drawn by
    * md5-inverse-CDF (the repo's only randomness), resample means in
    * integer micro-cents, CI = 2nd/31st order statistics.
    *
    * Exactness: weights are integer thresholds on a md5-derived
    * uniform; resample sums are integer; each mean is one DIV. The
    * ranking that picks the CI bounds orders integers.
    *
    * Scale shape: one explode(B) pass over the fact rows (3 ints per
    * row post-projection) into a (type × B)-cell hash agg — at petabyte
    * scale the same statistic folds as B parallel conditional sums in
    * ONE un-exploded pass; the cell frame is O(|types|·B) either way.
    */
  def bootstrapCi(s: SparkSession, d: String): DataFrame = {
    val thr = PoisCdfMicro
    val rows = Tables.events(s, d).select(col("event_type"), col("event_id"),
      expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("v"))
    val point = rows.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        expr("(sum(v) * 1000000) DIV count(*)").as("mean_micro"))
    val exploded = rows
      .select(col("event_type"), col("event_id"), col("v"),
        explode(expr(s"sequence(0, ${BootB - 1})")).as("b"))
      .withColumn("u", expr(
        "pmod(CAST(conv(substring(md5(concat('boot:', event_id, ':', b)), 1, 6), 16, 10) AS BIGINT), 1000000)"))
      .withColumn("w",
        when(col("u") < thr(0), 0L).when(col("u") < thr(1), 1L)
          .when(col("u") < thr(2), 2L).when(col("u") < thr(3), 3L)
          .when(col("u") < thr(4), 4L).otherwise(5L))
    val means = exploded.groupBy(col("event_type"), col("b"))
      .agg(expr("(sum(w * v) * 1000000) DIV nullif(sum(w), 0)").as("m"))
    val w1 = Window.partitionBy("event_type").orderBy(col("m").asc, col("b").asc)
    val ci = means.withColumn("rk", row_number().over(w1))
      .groupBy("event_type")
      .agg(max(when(col("rk") === 2, col("m"))).as("ci_lo_micro"),
        max(when(col("rk") === BootB - 1, col("m"))).as("ci_hi_micro"))
    point.join(ci, "event_type")
      .select(col("event_type"), col("n"), col("mean_micro"),
        col("ci_lo_micro"), col("ci_hi_micro"))
  }

  /** Robust per-source length statistics — exact rank-based median,
    * MAD, 10%-trimmed mean, and 10%-winsorized mean of document token
    * counts: the outlier-resistant dashboard row a corpus review
    * reads instead of a mean that one 10M-token crawl artifact can
    * drag arbitrarily (robust location/scale is how length anomalies
    * actually get caught). Definitions are rank-exact, no
    * interpolation: median = value at row (n+1) DIV 2 in (len,
    * doc_id) order (deterministic tie-break); MAD = same lower
    * median over |len − median|; trimmed mean averages rows with
    * floor(n/10) cut from EACH side; winsorized clamps to the values
    * at those cut ranks. Lengths are integers, means are integer
    * sums micro-quantized at one division — every emitted number
    * derives from exact integers.
    *
    * Scale note: the per-source rank windows are total orders WITHIN
    * a source (one partition per source) — the exact-statistics
    * contract shared with classifier_calibration's ntile; the
    * sketch-based quantile operator is the registered scale path for
    * corpus-sized groups.
    */
  def robustStats(s: SparkSession, d: String): DataFrame = {
    val lens = Tables.documents(s, d)
      .select(col("source"), col("doc_id"),
        size(graft.queries.Dedup.tokensCol(col("text"))).cast("long")
          .as("len"))
    // per-source (rank, size) via the ScalableRank grouped rank —
    // a per-source window partition would gather each source's whole
    // doc population on one core for these order statistics
    val ranked = graft.core.ScalableRank
      .groupedRank(lens, "source", "rn", "n",
        col("len").asc, col("doc_id").asc)
      .withColumn("cut", expr("CAST(n DIV 10 AS BIGINT)"))
    val firstPass = ranked.groupBy("source")
      .agg(max(col("n")).as("n_docs"), max(col("cut")).as("cut"),
        max(when(col("rn") === expr("(n + 1) DIV 2"), col("len")))
          .as("p50"),
        max(when(col("rn") === col("cut") + 1, col("len"))).as("lo_val"),
        max(when(col("rn") === col("n") - col("cut"), col("len")))
          .as("hi_val"),
        sum(when(col("rn") > col("cut") && col("rn") <= col("n") - col("cut"),
          col("len"))).as("trim_sum"))
    val joined = lens.join(broadcast(firstPass), "source")
    val dev = joined
      .select(col("source"), col("doc_id"), col("n_docs"), col("cut"),
        col("p50"), col("lo_val"), col("hi_val"), col("trim_sum"),
        abs(col("len") - col("p50")).as("ad"),
        greatest(least(col("len"), col("hi_val")), col("lo_val")).as("wl"))
    graft.core.ScalableRank
      .groupedRank(dev, "source", "rd", "__n2",
        col("ad").asc, col("doc_id").asc)
      .groupBy("source")
      .agg(max(col("n_docs")).as("n_docs"), max(col("p50")).as("p50"),
        max(when(col("rd") === expr("(n_docs + 1) DIV 2"), col("ad")))
          .as("mad"),
        max(col("trim_sum")).as("trim_sum"), max(col("cut")).as("cut"),
        sum(col("wl")).as("wins_sum"))
      .select(col("source"), col("n_docs"), col("p50"), col("mad"),
        floor(col("trim_sum").cast("double") * 1e6
          / (col("n_docs") - lit(2L) * col("cut")) + lit(0.5)).cast("long")
          .as("trimmed_mean_micro"),
        floor(col("wins_sum").cast("double") * 1e6 / col("n_docs")
          + lit(0.5)).cast("long").as("winsor_mean_micro"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "robust_stats" -> robustStats,
    "bootstrap_ci" -> bootstrapCi,
    "quantiles_exact" -> quantilesExact,
    "survival_km" -> survivalKm,
    "ab_test_chi2" -> abTestChi2,
    "corr_matrix" -> corrMatrix,
    "weighted_median" -> weightedMedian,
    "benford_screen" -> benfordScreen,
    "did_readout" -> didReadout)

  def oracleSql: Map[String, String] = Map(
    "robust_stats" ->
      """WITH lens AS (
        |  SELECT source, doc_id,
        |    CAST(len(list_filter(string_split_regex(text, '[^\p{L}]+'),
        |      x -> len(x) > 0)) AS BIGINT) AS len
        |  FROM documents),
        |ranked AS (
        |  SELECT source, doc_id, len,
        |    row_number() OVER (PARTITION BY source ORDER BY len, doc_id)
        |      AS rn,
        |    count(*) OVER (PARTITION BY source) AS n
        |  FROM lens),
        |fp AS (
        |  SELECT source, CAST(max(n) AS BIGINT) AS n_docs,
        |    CAST(max(n // 10) AS BIGINT) AS cut,
        |    max(CASE WHEN rn = (n + 1) // 2 THEN len END) AS p50,
        |    max(CASE WHEN rn = n // 10 + 1 THEN len END) AS lo_val,
        |    max(CASE WHEN rn = n - n // 10 THEN len END) AS hi_val,
        |    CAST(sum(CASE WHEN rn > n // 10 AND rn <= n - n // 10
        |      THEN len END) AS BIGINT) AS trim_sum
        |  FROM ranked GROUP BY source),
        |dev AS (
        |  SELECT l.source, fp.n_docs, fp.cut, fp.p50, fp.trim_sum,
        |    abs(l.len - fp.p50) AS ad,
        |    greatest(least(l.len, fp.hi_val), fp.lo_val) AS wl,
        |    row_number() OVER (PARTITION BY l.source
        |      ORDER BY abs(l.len - fp.p50), l.doc_id) AS rd
        |  FROM lens l JOIN fp USING (source))
        |SELECT source, max(n_docs) AS n_docs, max(p50) AS p50,
        |  max(CASE WHEN rd = (n_docs + 1) // 2 THEN ad END) AS mad,
        |  CAST(floor(CAST(max(trim_sum) AS DOUBLE) * 1e6
        |    / (max(n_docs) - 2 * max(cut)) + 0.5) AS BIGINT)
        |    AS trimmed_mean_micro,
        |  CAST(floor(CAST(sum(wl) AS DOUBLE) * 1e6 / max(n_docs) + 0.5)
        |    AS BIGINT) AS winsor_mean_micro
        |FROM dev GROUP BY source""".stripMargin,
    "bootstrap_ci" ->
      s"""WITH r AS (
         |  SELECT event_type, event_id,
         |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
         |  FROM events),
         |pt AS (
         |  SELECT event_type, count(*) AS n,
         |    CAST(sum(v) * 1000000 // count(*) AS BIGINT) AS mean_micro
         |  FROM r GROUP BY 1),
         |ex AS (
         |  SELECT event_type, v, b.b,
         |    CAST(('0x' || substr(md5('boot:' || event_id || ':' || b.b), 1, 6))
         |      AS UBIGINT) % 1000000 AS u
         |  FROM r, generate_series(0, ${BootB - 1}) AS b(b)),
         |wt AS (
         |  SELECT event_type, b, v,
         |    CASE WHEN u < ${PoisCdfMicro(0)} THEN 0
         |         WHEN u < ${PoisCdfMicro(1)} THEN 1
         |         WHEN u < ${PoisCdfMicro(2)} THEN 2
         |         WHEN u < ${PoisCdfMicro(3)} THEN 3
         |         WHEN u < ${PoisCdfMicro(4)} THEN 4
         |         ELSE 5 END AS w
         |  FROM ex),
         |m AS (
         |  SELECT event_type, b,
         |    CAST(sum(w * v) * 1000000 // nullif(sum(w), 0) AS BIGINT) AS m
         |  FROM wt GROUP BY 1, 2),
         |rk AS (SELECT event_type, m,
         |         row_number() OVER (PARTITION BY event_type
         |           ORDER BY m, b) AS rk FROM m),
         |ci AS (
         |  SELECT event_type,
         |    max(CASE WHEN rk = 2 THEN m END) AS ci_lo_micro,
         |    max(CASE WHEN rk = ${BootB - 1} THEN m END) AS ci_hi_micro
         |  FROM rk GROUP BY 1)
         |SELECT pt.event_type, pt.n, pt.mean_micro,
         |  ci.ci_lo_micro, ci.ci_hi_micro
         |FROM pt JOIN ci USING (event_type)""".stripMargin,
    "quantiles_exact" ->
      """SELECT event_type, count(*) AS n,
        |  quantile_cont(value, 0.25) AS p25,
        |  quantile_cont(value, 0.5)  AS p50,
        |  quantile_cont(value, 0.75) AS p75,
        |  quantile_cont(value, 0.95) AS p95
        |FROM events GROUP BY event_type""".stripMargin,
    "weighted_median" ->
      """WITH cells AS (
        |  SELECT l_returnflag AS grp,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v,
        |    CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS w
        |  FROM lineitem GROUP BY 1, 2),
        |run AS (
        |  SELECT grp, v, w,
        |    CAST(sum(w) OVER (PARTITION BY grp ORDER BY v
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumw,
        |    CAST(sum(w) OVER (PARTITION BY grp) AS BIGINT) AS totw
        |  FROM cells)
        |SELECT grp, totw AS total_weight, v AS median_cents
        |FROM (SELECT *, row_number() OVER (PARTITION BY grp ORDER BY v) AS rn
        |      FROM run WHERE cumw * 2 >= totw)
        |WHERE rn = 1""".stripMargin,
    "benford_screen" ->
      """WITH obs AS (
        |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100 + 0.5)
        |      AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit,
        |    count(*) AS n_obs
        |  FROM orders GROUP BY 1),
        |spine AS (SELECT unnest(generate_series(1, 9)) AS digit),
        |tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM obs),
        |terms AS (
        |  SELECT CAST(s.digit AS BIGINT) AS digit,
        |    CAST(coalesce(o.n_obs, 0) AS BIGINT) AS n_obs, t.n,
        |    CAST(t.n AS DOUBLE) * log10(1.0 + 1.0 / s.digit) AS exp_d
        |  FROM spine s LEFT JOIN obs o ON o.digit = s.digit CROSS JOIN tot t),
        |q AS (
        |  SELECT digit, n_obs, n,
        |    CAST(floor(exp_d * 1000000 + 0.5) AS BIGINT) AS exp_micro,
        |    CAST(floor((CAST(n_obs AS DOUBLE) - exp_d)
        |      * (CAST(n_obs AS DOUBLE) - exp_d) / exp_d * 1000000 + 0.5)
        |      AS BIGINT) AS term_micro
        |  FROM terms)
        |SELECT digit, n_obs, n, exp_micro, term_micro,
        |  CAST(sum(term_micro) OVER () AS BIGINT) AS chi2_micro
        |FROM q""".stripMargin,
    "did_readout" ->
      """WITH ev AS (
        |  SELECT user_id % 2 AS treat,
        |    CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT) AS day,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
        |  FROM events),
        |mid AS (SELECT (min(day) + max(day) + 1) // 2 AS mid FROM ev),
        |cells AS (
        |  SELECT
        |    CAST(sum(CASE WHEN treat = 1 AND day < mid THEN 1 ELSE 0 END) AS BIGINT) AS n_t_pre,
        |    CAST(sum(CASE WHEN treat = 1 AND day < mid THEN c ELSE 0 END) AS BIGINT) AS s_t_pre,
        |    CAST(sum(CASE WHEN treat = 1 AND day >= mid THEN 1 ELSE 0 END) AS BIGINT) AS n_t_post,
        |    CAST(sum(CASE WHEN treat = 1 AND day >= mid THEN c ELSE 0 END) AS BIGINT) AS s_t_post,
        |    CAST(sum(CASE WHEN treat = 0 AND day < mid THEN 1 ELSE 0 END) AS BIGINT) AS n_c_pre,
        |    CAST(sum(CASE WHEN treat = 0 AND day < mid THEN c ELSE 0 END) AS BIGINT) AS s_c_pre,
        |    CAST(sum(CASE WHEN treat = 0 AND day >= mid THEN 1 ELSE 0 END) AS BIGINT) AS n_c_post,
        |    CAST(sum(CASE WHEN treat = 0 AND day >= mid THEN c ELSE 0 END) AS BIGINT) AS s_c_post
        |  FROM ev CROSS JOIN mid),
        |m AS (
        |  SELECT n_t_pre, n_t_post, n_c_pre, n_c_post,
        |    s_t_pre * 10000 // n_t_pre AS m_t_pre_micro,
        |    s_t_post * 10000 // n_t_post AS m_t_post_micro,
        |    s_c_pre * 10000 // n_c_pre AS m_c_pre_micro,
        |    s_c_post * 10000 // n_c_post AS m_c_post_micro
        |  FROM cells)
        |SELECT *, (m_t_post_micro - m_t_pre_micro)
        |  - (m_c_post_micro - m_c_pre_micro) AS did_micro
        |FROM m""".stripMargin,
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
