package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.core.Tables
import graft.core.Checkpoints.StableOps

/** Data-profiling and series-diagnostic operators ([EXT]): the
  * schema-discovery and exploratory passes a warehouse runs before
  * trusting a new dataset — inclusion-dependency (foreign-key
  * candidate) discovery, categorical mutual information, and the
  * autocorrelation function of the event time series.
  *
  * Exactness conventions as everywhere in this repo: counts stay
  * integers, second moments accumulate in DECIMAL(38,0), and each
  * float is a single correctly-rounded IEEE chain over exact
  * integers — all three queries carry full DuckDB hash oracles.
  */
object Profiling {

  /** ACF lags reported. */
  val AcfMaxLag = 7

  /** Candidate key columns profiled by [[fkDiscovery]] — every
    * *key-typed column in the star schema. */
  val KeyCols: Seq[(String, String)] = Seq(
    "region" -> "r_regionkey", "nation" -> "n_nationkey",
    "nation" -> "n_regionkey", "customer" -> "c_custkey",
    "customer" -> "c_nationkey", "supplier" -> "s_suppkey",
    "supplier" -> "s_nationkey", "part" -> "p_partkey",
    "orders" -> "o_orderkey", "orders" -> "o_custkey",
    "lineitem" -> "l_orderkey", "lineitem" -> "l_partkey",
    "lineitem" -> "l_suppkey")

  private def tableOf(s: SparkSession, d: String, t: String): DataFrame = t match {
    case "region"   => Tables.region(s, d)
    case "nation"   => Tables.nation(s, d)
    case "customer" => Tables.customer(s, d)
    case "supplier" => Tables.supplier(s, d)
    case "part"     => Tables.part(s, d)
    case "orders"   => Tables.orders(s, d)
    case "lineitem" => Tables.lineitem(s, d)
    case "documents" => Tables.documents(s, d)
  }

  /** Inclusion-dependency discovery (the unary-IND half of data-
    * profiling suites like SPIDER/Sindy): for every DIRECTED pair of
    * declared key columns, the fraction of the child's distinct
    * values contained in the parent — frac 1.0 ⇒ a foreign-key
    * candidate. Emits every overlapping pair with distinct/common
    * counts, a micro-quantized containment fraction, and the
    * inclusion verdict.
    *
    * Scale shape (the Sindy trick): ONE tall `(column, value)`
    * distinct frame unions all columns, and a single value-keyed
    * self-join counts EVERY pairwise intersection in one shuffle —
    * no per-pair anti-join sweep; per-value fan-out is bounded by
    * the (constant) declared column count squared. Intersections are
    * symmetric, so the join enumerates only ordered `a < b` pairs
    * (halving the aggregation input — TPC-H id spaces are dense
    * integers from 1, so most values hit most columns) and both
    * directions are emitted from the one count.
    */
  def fkDiscovery(s: SparkSession, d: String): DataFrame = {
    // one scan per TABLE (all its key columns exploded together) and
    // one global distinct — not a scan+shuffle per column
    val tall = KeyCols.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, cs) =>
      tableOf(s, d, t).select(explode(array(cs.map { case (_, c) =>
        struct(lit(s"$t.$c").as("col_name"), col(c).cast("long").as("v"))
      }: _*)).as("e")).select(col("e.col_name"), col("e.v"))
    }.reduce(_ unionAll _).distinct().persist()
    val sizes = tall.groupBy("col_name").agg(count(lit(1)).as("n_distinct"))
    val rhs = tall.select(col("col_name").as("col2"), col("v").as("v2"))
    // persisted: the symmetrizing union below reads it twice, and the
    // join+agg IS the query's cost — recomputing it would undo the win
    val half = tall.join(rhs,
        col("v") === col("v2") && col("col_name") < col("col2"))
      .groupBy(col("col_name").as("ca"), col("col2").as("cb"))
      .agg(count(lit(1)).as("n_common")).persist()
    val inter = half.select(col("ca").as("child_col"),
        col("cb").as("parent_col"), col("n_common"))
      .unionAll(half.select(col("cb").as("child_col"),
        col("ca").as("parent_col"), col("n_common")))
    val out = inter
      .join(sizes.select(col("col_name").as("child_col"),
        col("n_distinct").as("n_child")), "child_col")
      .join(sizes.select(col("col_name").as("parent_col"),
        col("n_distinct").as("n_parent")), "parent_col")
      .select(col("child_col"), col("parent_col"), col("n_child"),
        col("n_parent"), col("n_common"),
        expr("n_common * 1000000L div n_child").as("frac_micro"),
        (col("n_common") === col("n_child")).as("is_inclusion"))
    val collected = out.stable
    tall.unpersist(false); half.unpersist(false)
    collected
  }

  /** Mutual information of the (source, lang) categorical pair over
    * the documents table — the dependence screen a mixture designer
    * reads before stratifying. Each cell's contribution
    * (c/n)·ln(c·n/(r·s)) is a fixed-order IEEE chain over exact
    * integer counts, floor-quantized to nano-nats BEFORE the global
    * sum, so MI is an exact integer total (merge-order independent).
    * Cells are bounded by |sources|·|langs|; the marginal windows run
    * on the cell frame, never the corpus.
    */
  def mutualInfo(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val cells = Tables.documents(s, d)
      .groupBy("source", "lang").agg(count(lit(1)).as("c"))
    val srcW = w.partitionBy("source")
    val lgW = w.partitionBy("lang")
    val allW = w.partitionBy()
    cells
      .withColumn("r", sum("c").over(srcW))
      .withColumn("s", sum("c").over(lgW))
      .withColumn("n", sum("c").over(allW))
      .withColumn("term_nano",
        floor((col("c").cast("double") / col("n"))
          * log(col("c").cast("double") * col("n")
            / (col("r").cast("double") * col("s")))
          * 1000000000 + lit(0.5)).cast("long"))
      .withColumn("mi_nano", sum("term_nano").over(allW))
      .select("source", "lang", "c", "r", "s", "n", "term_nano", "mi_nano")
  }

  /** Autocorrelation function of the daily event-count series at lags
    * 0..[[AcfMaxLag]], on the DENSE day spine (missing days count 0).
    * Exact-moment form: with S = Σx and n days, the mean-centered
    * products scale by n² to integers — acf(k) =
    * Σ(n·x_t−S)(n·x_{t+k}−S) / Σ(n·x_t−S)² with both sums
    * accumulated in DECIMAL(38,0), so the only float is the final
    * ratio (micro-quantized). The series is calendar-bounded: after
    * the one groupBy(day) pass everything operates on O(days) cells,
    * and the lag join is cell × 8 lags.
    */
  def tsAcf(s: SparkSession, d: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val perDay = Tables.events(s, d)
      .select(expr("ts DIV 86400000000000").as("day"))
      .groupBy("day").agg(count(lit(1)).as("c"))
    val bounds = perDay.agg(min("day").as("d0"), max("day").as("d1"))
    val spine = bounds.select(explode(sequence(col("d0"), col("d1"))).as("day"))
    val series = spine.join(perDay, Seq("day"), "left")
      .select(col("day"), coalesce(col("c"), lit(0L)).as("x"))
    val tot = series.agg(count(lit(1)).as("n"), sum("x").as("sx"))
    val cent = series.crossJoin(broadcast(tot))
      .select(col("day"),
        (col("n").cast(dec) * col("x").cast(dec) - col("sx").cast(dec)).as("z"))
      .persist()
    val lagFrame = s.range(0, AcfMaxLag + 1).select(col("id").as("lag"))
    val pairs = cent
      .crossJoin(broadcast(lagFrame))
      .join(cent.select(col("day").as("day2"), col("z").as("z2")),
        col("day2") === col("day") + col("lag"))
      .groupBy("lag")
      .agg(count(lit(1)).as("n_pairs"), sum(col("z") * col("z2")).as("num"))
    val den = pairs.filter(col("lag") === 0).select(col("num").as("den"))
    val out = pairs.crossJoin(broadcast(den))
      .select(col("lag"), col("n_pairs"),
        (floor(col("num").cast("double") / col("den").cast("double")
          * 1000000 + lit(0.5)) / 1000000.0).as("acf"))
    val collected = out.stable
    cent.unpersist(false)
    collected
  }

  /** Candidate functional dependencies A → B profiled by
    * [[fdDiscovery]]: (table, determinant, dependent). Mix of true
    * FDs (key → attribute) and expected violations — the profiler
    * reports both. */
  val FdPairs: Seq[(String, String, String)] = Seq(
    ("nation", "n_nationkey", "n_name"),
    ("nation", "n_nationkey", "n_regionkey"),
    ("nation", "n_name", "n_regionkey"),
    ("nation", "n_regionkey", "n_name"),
    ("customer", "c_custkey", "c_nationkey"),
    ("customer", "c_nationkey", "c_mktsegment"),
    ("orders", "o_orderkey", "o_custkey"),
    ("orders", "o_custkey", "o_orderstatus"),
    ("lineitem", "l_orderkey", "l_partkey"),
    ("lineitem", "l_partkey", "l_suppkey"),
    ("part", "p_partkey", "p_brand"),
    ("part", "p_brand", "p_type"),
    ("documents", "doc_id", "source"),
    ("documents", "source", "lang"))

  /** Functional-dependency discovery (the unary-FD half of TANE-class
    * profilers): A → B holds iff every A-group has exactly one
    * distinct B. Emits per declared pair the group count, violating-
    * group count, the worst group's distinct-B fan-out, and the
    * verdict.
    *
    * Scale shape: each pair is ONE two-column scan (column-pruned)
    * into a (A → distinct-B-count) groupBy whose second stage is a
    * constant 4-row summary; pairs are a declared constant. No
    * value-keyed self-join is needed because FDs — unlike INDs — are
    * per-table. */
  def fdDiscovery(s: SparkSession, d: String): DataFrame =
    FdPairs.map { case (t, a, b) =>
      tableOf(s, d, t)
        .groupBy(col(a)).agg(countDistinct(col(b)).as("nb"))
        .agg(count(lit(1)).as("n_groups"),
          sum(when(col("nb") > 1, 1L).otherwise(0L)).as("n_violating"),
          max("nb").as("max_fanout"))
        .select(lit(t).as("table_name"), lit(a).as("det_col"),
          lit(b).as("dep_col"), col("n_groups"), col("n_violating"),
          col("max_fanout"), (col("n_violating") === 0L).as("holds"))
    }.reduce(_ unionAll _)

  /** CUSUM slack in per-mille of the series mean (Page '54's k
    * parameter — drifts smaller than this fraction of the mean are
    * absorbed). */
  val CusumSlackPermille = 100L

  /** CUSUM change-point statistic over the daily event-count series
    * (Page '54), in the exact prefix-sum form: with z_t the n²-scaled
    * centered residual (n·1000·x_t − 1000·S − slack·S exact ints,
    * slack = [[CusumSlackPermille]]‰ of the mean), the one-sided
    * statistics are C⁺_t = P_t − min_{j≤t} P_j and
    * C⁻_t = max_{j≤t} P_j − P_t over the prefix sums P — running
    * extrema instead of the textbook recursive clamp, so the whole
    * series is two window passes, exact in DECIMAL(38,0). The argmax
    * day of max(C⁺, C⁻) is flagged as the change point.
    *
    * Scale shape: identical to [[tsAcf]] — one groupBy(day) corpus
    * pass, then everything is calendar-bounded cells.
    */
  def changepointCusum(s: SparkSession, d: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val perDay = Tables.events(s, d)
      .select(expr("ts DIV 86400000000000").as("day"))
      .groupBy("day").agg(count(lit(1)).as("c"))
    val bounds = perDay.agg(min("day").as("d0"), max("day").as("d1"))
    val spine = bounds.select(explode(sequence(col("d0"), col("d1"))).as("day"))
    val series = spine.join(perDay, Seq("day"), "left")
      .select(col("day"), coalesce(col("c"), lit(0L)).as("x"))
    val tot = series.agg(count(lit(1)).as("n"), sum("x").as("sx"))
    val w = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = series.crossJoin(broadcast(tot))
      .select(col("day"), col("x"),
        (col("n").cast(dec) * col("x").cast(dec) * lit(1000L).cast(dec)
          - col("sx").cast(dec) * lit(1000L + CusumSlackPermille).cast(dec))
          .as("zp"),
        (col("n").cast(dec) * col("x").cast(dec) * lit(1000L).cast(dec)
          - col("sx").cast(dec) * lit(1000L - CusumSlackPermille).cast(dec))
          .as("zm"))
      .withColumn("pp", sum("zp").over(w))
      .withColumn("pm", sum("zm").over(w))
      // the prefix extrema include the EMPTY prefix P_0 = 0 (else the
      // recursive-clamp equivalence breaks when P never crosses zero)
      .withColumn("cpos", (col("pp")
        - least(lit(0L).cast(dec), min(col("pp")).over(w))).cast("long"))
      .withColumn("cneg", (greatest(lit(0L).cast(dec),
        max(col("pm")).over(w)) - col("pm")).cast("long"))
      .select(col("day"), col("x"), col("cpos"), col("cneg"))
    val rkW = Window.orderBy(
      greatest(col("cpos"), col("cneg")).desc, col("day").asc)
    scored.withColumn("is_change_point", row_number().over(rkW) === 1)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fk_discovery" -> fkDiscovery,
    "fd_discovery" -> fdDiscovery,
    "changepoint_cusum" -> changepointCusum,
    "mutual_info" -> mutualInfo,
    "ts_acf" -> tsAcf)

  def oracleSql: Map[String, String] = Map(
    "fd_discovery" -> {
      val rows = FdPairs.map { case (t, a, b) =>
        s"""SELECT '$t' AS table_name, '$a' AS det_col, '$b' AS dep_col,
           |  count(*) AS n_groups,
           |  CAST(sum(CASE WHEN nb > 1 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_violating,
           |  max(nb) AS max_fanout,
           |  sum(CASE WHEN nb > 1 THEN 1 ELSE 0 END) = 0 AS holds
           |FROM (SELECT $a, count(DISTINCT $b) AS nb FROM $t GROUP BY $a)""".stripMargin
      }.mkString("\nUNION ALL\n")
      rows
    },
    "changepoint_cusum" ->
      s"""WITH per_day AS (
         |  SELECT CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT)
         |    AS day, count(*) AS c
         |  FROM events GROUP BY 1),
         |spine AS (
         |  SELECT unnest(generate_series((SELECT min(day) FROM per_day),
         |                                (SELECT max(day) FROM per_day))) AS day),
         |series AS (
         |  SELECT s.day, CAST(coalesce(p.c, 0) AS BIGINT) AS x
         |  FROM spine s LEFT JOIN per_day p ON p.day = s.day),
         |tot AS (SELECT CAST(count(*) AS HUGEINT) AS n,
         |               CAST(sum(x) AS HUGEINT) AS sx FROM series),
         |z AS (
         |  SELECT day, x,
         |    n * CAST(x AS HUGEINT) * 1000 - sx * ${1000 + CusumSlackPermille}
         |      AS zp,
         |    n * CAST(x AS HUGEINT) * 1000 - sx * ${1000 - CusumSlackPermille}
         |      AS zm
         |  FROM series CROSS JOIN tot),
         |pref AS (
         |  SELECT day, x,
         |    sum(zp) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS pp,
         |    sum(zm) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS pm
         |  FROM z),
         |stat AS (
         |  SELECT day, x,
         |    CAST(pp - least(CAST(0 AS HUGEINT),
         |      min(pp) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING))
         |      AS BIGINT) AS cpos,
         |    CAST(greatest(CAST(0 AS HUGEINT),
         |      max(pm) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)) - pm
         |      AS BIGINT) AS cneg
         |  FROM pref)
         |SELECT day, x, cpos, cneg,
         |  row_number() OVER (ORDER BY greatest(cpos, cneg) DESC, day ASC) = 1
         |    AS is_change_point
         |FROM stat""".stripMargin,
    "fk_discovery" -> {
      val tall = KeyCols.map { case (t, c) =>
        s"SELECT DISTINCT '$t.$c' AS col_name, CAST($c AS BIGINT) AS v FROM $t"
      }.mkString("\n  UNION ALL ")
      s"""WITH tall AS (
         |  $tall),
         |sizes AS (SELECT col_name, count(*) AS n_distinct FROM tall GROUP BY 1),
         |inter AS (
         |  SELECT a.col_name AS child_col, b.col_name AS parent_col,
         |    count(*) AS n_common
         |  FROM tall a JOIN tall b ON a.v = b.v AND a.col_name <> b.col_name
         |  GROUP BY 1, 2)
         |SELECT i.child_col, i.parent_col,
         |  sc.n_distinct AS n_child, sp.n_distinct AS n_parent, i.n_common,
         |  CAST(i.n_common * 1000000 // sc.n_distinct AS BIGINT) AS frac_micro,
         |  i.n_common = sc.n_distinct AS is_inclusion
         |FROM inter i
         |JOIN sizes sc ON sc.col_name = i.child_col
         |JOIN sizes sp ON sp.col_name = i.parent_col""".stripMargin
    },
    "mutual_info" ->
      """WITH cells AS (
        |  SELECT source, lang, count(*) AS c
        |  FROM documents GROUP BY 1, 2),
        |ext AS (
        |  SELECT source, lang, c,
        |    CAST(sum(c) OVER (PARTITION BY source) AS BIGINT) AS r,
        |    CAST(sum(c) OVER (PARTITION BY lang) AS BIGINT) AS s,
        |    CAST(sum(c) OVER () AS BIGINT) AS n
        |  FROM cells),
        |terms AS (
        |  SELECT source, lang, c, r, s, n,
        |    CAST(floor((CAST(c AS DOUBLE) / n)
        |      * ln(CAST(c AS DOUBLE) * n / (CAST(r AS DOUBLE) * s))
        |      * 1000000000 + 0.5) AS BIGINT) AS term_nano
        |  FROM ext)
        |SELECT source, lang, c, r, s, n, term_nano,
        |  CAST(sum(term_nano) OVER () AS BIGINT) AS mi_nano
        |FROM terms""".stripMargin,
    "ts_acf" ->
      s"""WITH per_day AS (
         |  SELECT CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT) AS day,
         |    count(*) AS c
         |  FROM events GROUP BY 1),
         |spine AS (
         |  SELECT unnest(generate_series((SELECT min(day) FROM per_day),
         |                                (SELECT max(day) FROM per_day))) AS day),
         |series AS (
         |  SELECT s.day, CAST(coalesce(p.c, 0) AS BIGINT) AS x
         |  FROM spine s LEFT JOIN per_day p ON p.day = s.day),
         |tot AS (SELECT CAST(count(*) AS HUGEINT) AS n,
         |               CAST(sum(x) AS HUGEINT) AS sx FROM series),
         |cent AS (
         |  SELECT day, n * CAST(x AS HUGEINT) - sx AS z
         |  FROM series CROSS JOIN tot),
         |pairs AS (
         |  SELECT l.lag, count(*) AS n_pairs, sum(a.z * b.z) AS num
         |  FROM (SELECT unnest(generate_series(0, $AcfMaxLag)) AS lag) l
         |  JOIN cent a ON TRUE
         |  JOIN cent b ON b.day = a.day + l.lag
         |  GROUP BY l.lag)
         |SELECT CAST(p.lag AS BIGINT) AS lag, p.n_pairs,
         |  floor(CAST(p.num AS DOUBLE) / CAST(d.num AS DOUBLE)
         |    * 1000000 + 0.5) / 1000000.0 AS acf
         |FROM pairs p CROSS JOIN (SELECT num FROM pairs WHERE lag = 0) d""".stripMargin)
}
