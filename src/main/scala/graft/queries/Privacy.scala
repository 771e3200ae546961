package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** k-anonymity operators (Sweeney 2002) over the customer table —
  * the data-governance gate a pipeline runs before releasing
  * quasi-identifier columns. Complements the redaction ops
  * (TextOps.pii_mask, Temporal.privacy_erase): those remove values,
  * these measure and repair RE-IDENTIFIABILITY — a record is k-anon
  * safe iff its quasi-identifier combination is shared by ≥ k rows.
  *
  * Quasi-identifiers here: (c_nationkey, c_mktsegment); k = 10 (k=5 is vacuous at the
  * sf0.01 gate — every class already has ≥ 5 members).
  *
  * Scale: both operators are one hash aggregate over the QID key
  * (map-side partials collapse to |QID-combinations| rows — bounded
  * by the attribute domain product, not the table), plus, for the
  * repair pass, a second aggregate over the generalized key. Nothing
  * row-scaled ever reaches the driver.
  */
object Privacy {

  private val K = 10

  /** Equivalence-class census: one row per QID combination with its
    * size and the k-violation flag. The shape an auditor reads — and
    * the exact input the generalization pass consumes.
    */
  def privacyKanon(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .groupBy("c_nationkey", "c_mktsegment")
      .agg(count(lit(1)).as("class_size"))
      .withColumn("violates", col("class_size") < K)

  /** One-level generalization repair: classes already ≥ k keep their
    * full QID; violating classes generalize c_mktsegment → '*' and
    * re-group per nation. `residual` marks nations whose merged
    * remainder class STILL falls below k (needing the next rung of
    * the hierarchy — suppression or nation generalization).
    */
  def privacyKanonGeneralize(s: SparkSession, d: String): DataFrame = {
    val census = privacyKanon(s, d)
    val ok = census.filter(!col("violates"))
      .select(col("c_nationkey"), col("c_mktsegment").as("segment"),
        col("class_size"), lit(false).as("generalized"), lit(false).as("residual"))
    val merged = census.filter(col("violates"))
      .groupBy("c_nationkey")
      .agg(sum("class_size").as("class_size"))
      .select(col("c_nationkey"), lit("*").as("segment"), col("class_size"),
        lit(true).as("generalized"), (col("class_size") < K).as("residual"))
    ok.unionAll(merged)
  }

  /** l-diversity floor (Machanavajjhala et al. '07). */
  val L = 3

  /** l-diversity census over the same (nation, segment) QID classes
    * as [[privacyKanon]], with the account-balance band as the
    * sensitive attribute: a class that is k-anonymous but whose
    * members all share one balance band still leaks — distinct
    * sensitive values per class must reach [[L]]. One groupBy with a
    * distinct-count; integer band rails.
    */
  def privacyLdiversity(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(col("c_nationkey"), col("c_mktsegment"),
        floor((col("c_acctbal") + 1000) / 2000).cast("long").as("band"))
      .groupBy("c_nationkey", "c_mktsegment")
      .agg(count(lit(1)).as("class_size"),
        countDistinct("band").as("n_sensitive"))
      .withColumn("violates_l", col("n_sensitive") < L)

  /** t-closeness threshold (Li et al. 2007): a class violates when its
    * sensitive-attribute distribution sits more than T (ordered EMD)
    * from the global one. 0.2 is the paper's worked example.
    */
  val Tclose = 0.2

  /** t-closeness census over the same (nation, segment) QID classes
    * and balance-band sensitive attribute as [[privacyLdiversity]] —
    * the next rung of the release ladder: a class can be k-anonymous
    * AND l-diverse yet still leak when its sensitive values skew far
    * from the table-wide distribution (all-l-distinct-but-extreme
    * bands). Distance is the ORDERED-attribute Earth Mover's Distance
    * of Li et al. §5.2: with bands sorted, EMD = Σᵢ|Pᵢ−Qᵢ|/(m−1) over
    * cumulative distributions. Kept exact end to end: the cumulative
    * difference cum_c·N − cum_g·n is an integer (class counts × global
    * total minus global counts × class size), each band's term is ONE
    * double division micro-quantized, and the per-class EMD is an
    * integer sum DIV (m−1) — merge-order free.
    *
    * Scale shape: two hash aggregates over (QID) and (QID, band), a
    * |bands|-row broadcast zero-fill (the attribute domain, not the
    * table), and a per-class window over ≤ m rows. Nothing row-scaled
    * leaves the executors.
    */
  def privacyTcloseness(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val banded = Tables.customer(s, d)
      .select(col("c_nationkey"), col("c_mktsegment"),
        floor((col("c_acctbal") + 1000) / 2000).cast("long").as("band"))
    val global = banded.groupBy("band").agg(count(lit(1)).as("g"))
    val totals = global.agg(sum("g").as("nn"), count(lit(1)).as("m"))
    val classes = banded.groupBy("c_nationkey", "c_mktsegment")
      .agg(count(lit(1)).as("class_size"))
    val cells = banded.groupBy("c_nationkey", "c_mktsegment", "band")
      .agg(count(lit(1)).as("c"))
    val wdw = Window.partitionBy("c_nationkey", "c_mktsegment")
      .orderBy("band")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    classes
      .crossJoin(broadcast(global))
      .join(cells, Seq("c_nationkey", "c_mktsegment", "band"), "left")
      .crossJoin(broadcast(totals))
      .select(col("c_nationkey"), col("c_mktsegment"), col("class_size"),
        col("band"), col("m"),
        (coalesce(col("c"), lit(0L)) * col("nn")
          - col("g") * col("class_size")).as("diff"),
        (col("class_size") * col("nn")).as("den"))
      .withColumn("cum", sum(col("diff")).over(wdw))
      .select(col("c_nationkey"), col("c_mktsegment"), col("class_size"),
        col("m"),
        floor(abs(col("cum")).cast("double") * 1e6 / col("den") + lit(0.5))
          .cast("long").as("term"))
      .groupBy("c_nationkey", "c_mktsegment", "class_size", "m")
      .agg(sum("term").as("t_sum"))
      .select(col("c_nationkey"), col("c_mktsegment"), col("class_size"),
        // m == 1 (a single-band sensitive domain) makes EMD 0/0; the
        // distance is 0 by definition — every distribution over one
        // category is the global one. Guarded so a merely-concentrated
        // table reports 0 instead of a cross-engine NaN split.
        when(col("m") > 1,
          floor(col("t_sum").cast("double") / (col("m") - 1) + lit(0.5))
            .cast("long")).otherwise(lit(0L)).as("emd_micro"))
      .withColumn("violates_t",
        col("emd_micro") > lit((Tclose * 1e6).toLong))
  }

  /** Laplace scale b = Δf/ε with sensitivity 1 and ε = 1. */
  val DpScale = 1.0

  /** ε=1 Laplace mechanism over per-nation customer counts with
    * REPRODUCIBLE noise: the uniform draw comes from the md5
    * shard-key convention (seeded DP — what a resumable/backfillable
    * release pipeline actually ships, and the only form a
    * cross-engine hash gate can certify), pushed through the exact
    * inverse CDF −sign(u−½)·b·ln(1−2|u−½|). Emits the true count,
    * the micro-quantized noise, and the noised release value.
    *
    * PRIVACY STATUS depends on `spark.graft.dpSalt`: UNSET (the
    * default, and the only form a cross-engine hash gate can certify)
    * the noise derives from md5 of the PUBLIC group key, so anyone
    * can recompute and subtract it — a mechanism-shape demo
    * (sensitivity, scale, inverse-CDF sampling, the clipped two-query
    * mean recipe below), NOT epsilon-DP. SET to a secret value, the
    * salt mixes into every md5 seed ([[dpSeed]]) and the release is
    * the real seeded-Laplace mechanism: ε = 1 against any observer
    * who does not hold the salt, still reproducible for backfills by
    * whoever does. The driver's oracle runs with the conf unset, so
    * the certified rows are unchanged; PrivacySpec exercises the
    * salted path. Applies equally to [[privacyDpMean]], which shares
    * the draw.
    */
  private def dpSeed(s: SparkSession, tag: String, key: Column): Column =
    s.conf.getOption("spark.graft.dpSalt").filter(_.nonEmpty) match {
      case Some(salt) => concat(lit(salt), lit("|"), lit(tag), key)
      case None => concat(lit(tag), key)
    }

  def privacyDpCounts(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .groupBy("c_nationkey").agg(count(lit(1)).as("n_true"))
      .withColumn("u",
        (pmod(conv(substring(md5(dpSeed(s, "dp:",
          col("c_nationkey").cast("string"))), 1, 6), 16, 10).cast("long"),
          lit(1000000L)).cast("double") + 0.5) / 1000000.0)
      .withColumn("noise_micro",
        floor(-signum(col("u") - 0.5) * DpScale
          * log(lit(1.0) - lit(2.0) * abs(col("u") - 0.5))
          * 1000000 + lit(0.5)).cast("long"))
      .select(col("c_nationkey"), col("n_true"), col("noise_micro"),
        (col("n_true") * 1000000L + col("noise_micro"))
          .as("n_released_micro"))

  /** Clip bound for the DP mean (cents). */
  val DpClipCents = 10000L

  /** ε=1 DP MEAN of event value per event_type — the standard
    * clip-then-two-Laplace-queries recipe (Dwork & Roth §3.4): values
    * clip to [0, 100.00] (sensitivity = clip bound), ε splits evenly
    * between the sum query (scale 2C/ε) and the count query (scale
    * 2/ε), and the released mean is the noisy ratio. Same
    * reproducible md5-seeded inverse-CDF noise as
    * [[privacyDpCounts]] — a backfillable release. The one float
    * step beyond the shared ln chain is the final two-long division,
    * identical in both engines.
    *
    * Scale: one clipped-sum hash agg; noise is per-GROUP (|types|
    * rows), never per-row.
    */
  def privacyDpMean(s: SparkSession, d: String): DataFrame = {
    def lap(tag: String, scale: Double) = {
      val u = (pmod(conv(substring(md5(dpSeed(s, tag,
        col("event_type"))), 1, 6), 16, 10).cast("long"),
        lit(1000000L)).cast("double") + 0.5) / 1000000.0
      floor(-signum(u - 0.5) * scale
        * log(lit(1.0) - lit(2.0) * abs(u - 0.5)) * 1000000 + lit(0.5))
        .cast("long")
    }
    Tables.events(s, d)
      .select(col("event_type"),
        expr(s"least(greatest(CAST(floor(value * 100 + 0.5) AS BIGINT), 0L), $DpClipCents)")
          .as("v"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_true"), sum("v").as("sum_true_cents"))
      .withColumn("noise_sum_micro", lap("dpm_s:", 2.0 * DpClipCents))
      .withColumn("noise_n_micro", lap("dpm_n:", 2.0))
      .select(col("event_type"), col("n_true"), col("sum_true_cents"),
        (col("sum_true_cents") * 1000000L + col("noise_sum_micro"))
          .as("released_sum_micro"),
        (col("n_true") * 1000000L + col("noise_n_micro"))
          .as("released_n_micro"))
      .withColumn("mean_released_micro",
        floor(col("released_sum_micro").cast("double")
          / col("released_n_micro").cast("double") * 1000000 + lit(0.5))
          .cast("long"))
  }

  /** ε=1 EXPONENTIAL-MECHANISM median (McSherry & Talwar '07; Dwork &
    * Roth §3.4) of the balance band per nation — the DP battery's
    * third primitive (counts → Laplace, mean → clipped two-query,
    * quantile → exp-mech, the one Laplace cannot give you because a
    * quantile has unbounded value sensitivity but rank utility has
    * sensitivity 1). Candidates are the |bands| attribute domain;
    * utility u(b) = −|2·cum(b) − n| (twice the rank distance to the
    * median — half-unit-free integers, sensitivity 2); the release is
    * the Gumbel-max sampling identity argmax_b [ε·u(b)/(2Δu) + G_b]
    * = argmax_b [u(b)/4 + G_b], with G_b = −ln(−ln(U_b)) and U_b the
    * md5-seeded uniform of the (nation, band) cell. The argmax ranks
    * the INTEGER score u·250000 − round(G·1e6): the libm-log Gumbel
    * term is micro-quantized BEFORE the row_number pick, so a 1-ulp
    * cross-engine ln() difference cannot flip which band wins a
    * near-tie (the selection analogue of dp_counts' released-value
    * quantization; distribution shift from 1e-6 rounding is
    * negligible vs. the Gumbel scale of 1).
    *
    * PRIVACY STATUS: identical contract to [[privacyDpCounts]] — with
    * `spark.graft.dpSalt` unset the draw replays from public keys (a
    * certified mechanism-shape demo); set, it is the real seeded
    * mechanism (PrivacySpec exercises the salted path).
    *
    * Scale shape: one (nation, band) hash aggregate, a |bands|-row
    * broadcast zero-fill, per-class windows over ≤ m rows — the
    * privacy_tcloseness envelope, nothing row-scaled leaves the
    * executors.
    */
  def privacyDpQuantile(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val banded = Tables.customer(s, d)
      .select(col("c_nationkey"),
        floor((col("c_acctbal") + 1000) / 2000).cast("long").as("band"))
    val domain = banded.select("band").distinct()
    val cells = banded.groupBy("c_nationkey", "band")
      .agg(count(lit(1)).as("c"))
    val classes = cells.groupBy("c_nationkey").agg(sum("c").as("n"))
    val cumW = Window.partitionBy("c_nationkey").orderBy("band")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pick = Window.partitionBy("c_nationkey")
      .orderBy(col("score").desc, col("band").asc)
    classes
      .crossJoin(broadcast(domain))
      .join(cells, Seq("c_nationkey", "band"), "left")
      .withColumn("cum", sum(coalesce(col("c"), lit(0L))).over(cumW))
      .withColumn("u_int", -abs(lit(2L) * col("cum") - col("n")))
      .withColumn("uu",
        (pmod(conv(substring(md5(dpSeed(s, "dpq:",
          concat(col("c_nationkey").cast("string"), lit(":"),
            col("band").cast("string")))), 1, 6), 16, 10).cast("long"),
          lit(1000000L)).cast("double") + 0.5) / 1000000.0)
      // Integer score: u/4 − Gumbel, carried as micro-units. u_int·250000
      // is exact (long · long), and the libm-sourced Gumbel term is
      // quantized BEFORE the argmax — unlike dp_counts, where log feeds a
      // released value, here it feeds a row_number SELECTION, and a 1-ulp
      // cross-engine log difference could flip which band wins a near-tie.
      // After quantization both engines rank identical longs. (Exact-long
      // rail: |u_int|·250000 overflows past ~3.7e13 rows per class.)
      .withColumn("score",
        col("u_int") * lit(250000L) -
          floor(log(-log(col("uu"))) * lit(1e6) + lit(0.5)).cast("long"))
      .withColumn("true_band",
        min(when(lit(2L) * col("cum") >= col("n"), col("band")))
          .over(Window.partitionBy("c_nationkey")))
      .withColumn("rk", row_number().over(pick))
      .filter(col("rk") === 1)
      .select(col("c_nationkey"), col("n"), col("true_band"),
        col("band").as("released_band"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "privacy_dp_quantile" -> privacyDpQuantile,
    "privacy_dp_mean" -> privacyDpMean,
    "privacy_dp_counts" -> privacyDpCounts,
    "privacy_ldiversity" -> privacyLdiversity,
    "privacy_tcloseness" -> privacyTcloseness,
    "privacy_kanon" -> privacyKanon,
    "privacy_kanon_generalize" -> privacyKanonGeneralize)

  def oracleSql: Map[String, String] = Map(
    "privacy_dp_quantile" ->
      """WITH banded AS (
        |  SELECT c_nationkey,
        |    CAST(floor((c_acctbal + 1000) / 2000) AS BIGINT) AS band
        |  FROM customer),
        |dom AS (SELECT DISTINCT band FROM banded),
        |cells AS (SELECT c_nationkey, band, CAST(count(*) AS BIGINT) AS c
        |          FROM banded GROUP BY 1, 2),
        |cls AS (SELECT c_nationkey, CAST(sum(c) AS BIGINT) AS n
        |        FROM cells GROUP BY 1),
        |f AS (
        |  SELECT cls.c_nationkey, cls.n, dom.band,
        |    sum(coalesce(cells.c, 0)) OVER (PARTITION BY cls.c_nationkey
        |      ORDER BY dom.band
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM cls CROSS JOIN dom
        |  LEFT JOIN cells ON cells.c_nationkey = cls.c_nationkey
        |    AND cells.band = dom.band),
        |sc AS (
        |  SELECT c_nationkey, n, band,
        |    CAST(-abs(2 * cum - n) AS BIGINT) * 250000
        |      - CAST(floor(ln(-ln((CAST(('0x' || substr(md5('dpq:'
        |          || CAST(c_nationkey AS VARCHAR) || ':'
        |          || CAST(band AS VARCHAR)), 1, 6))::UBIGINT
        |          % 1000000 AS DOUBLE) + 0.5) / 1000000.0))
        |          * 1e6 + 0.5) AS BIGINT) AS score,
        |    min(CASE WHEN 2 * cum >= n THEN band END)
        |      OVER (PARTITION BY c_nationkey) AS true_band
        |  FROM f)
        |SELECT c_nationkey, n, true_band, band AS released_band
        |FROM (SELECT *, row_number() OVER (PARTITION BY c_nationkey
        |        ORDER BY score DESC, band ASC) AS rk
        |      FROM sc)
        |WHERE rk = 1""".stripMargin,
    "privacy_dp_mean" ->
      s"""WITH c AS (
         |  SELECT event_type, count(*) AS n_true,
         |    CAST(sum(least(greatest(
         |      CAST(floor(value * 100 + 0.5) AS BIGINT), 0), $DpClipCents))
         |      AS BIGINT) AS sum_true_cents
         |  FROM events GROUP BY 1),
         |u AS (
         |  SELECT event_type, n_true, sum_true_cents,
         |    (CAST(('0x' || substr(md5('dpm_s:' || event_type), 1, 6))::UBIGINT
         |       % 1000000 AS DOUBLE) + 0.5) / 1000000.0 AS us,
         |    (CAST(('0x' || substr(md5('dpm_n:' || event_type), 1, 6))::UBIGINT
         |       % 1000000 AS DOUBLE) + 0.5) / 1000000.0 AS un
         |  FROM c),
         |r AS (
         |  SELECT event_type, n_true, sum_true_cents,
         |    sum_true_cents * 1000000
         |      + CAST(floor(-sign(us - 0.5) * ${2.0 * DpClipCents}
         |          * ln(1.0 - 2.0 * abs(us - 0.5)) * 1000000 + 0.5) AS BIGINT)
         |      AS released_sum_micro,
         |    n_true * 1000000
         |      + CAST(floor(-sign(un - 0.5) * 2.0
         |          * ln(1.0 - 2.0 * abs(un - 0.5)) * 1000000 + 0.5) AS BIGINT)
         |      AS released_n_micro
         |  FROM u)
         |SELECT event_type, n_true, sum_true_cents,
         |  released_sum_micro, released_n_micro,
         |  CAST(floor(CAST(released_sum_micro AS DOUBLE)
         |    / CAST(released_n_micro AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
         |    AS mean_released_micro
         |FROM r""".stripMargin,
    "privacy_dp_counts" ->
      """WITH c AS (
        |  SELECT c_nationkey, count(*) AS n_true FROM customer GROUP BY 1),
        |u AS (
        |  SELECT c_nationkey, n_true,
        |    (CAST(('0x' || substr(md5('dp:' || CAST(c_nationkey AS VARCHAR)),
        |      1, 6))::UBIGINT % 1000000 AS DOUBLE) + 0.5) / 1000000.0 AS u
        |  FROM c)
        |SELECT c_nationkey, n_true,
        |  CAST(floor(-sign(u - 0.5) * 1.0 * ln(1.0 - 2.0 * abs(u - 0.5))
        |    * 1000000 + 0.5) AS BIGINT) AS noise_micro,
        |  n_true * 1000000
        |    + CAST(floor(-sign(u - 0.5) * 1.0 * ln(1.0 - 2.0 * abs(u - 0.5))
        |        * 1000000 + 0.5) AS BIGINT) AS n_released_micro
        |FROM u""".stripMargin,
    "privacy_ldiversity" ->
      s"""SELECT c_nationkey, c_mktsegment, count(*) AS class_size,
         |  CAST(count(DISTINCT CAST(floor((c_acctbal + 1000) / 2000)
         |    AS BIGINT)) AS BIGINT) AS n_sensitive,
         |  count(DISTINCT CAST(floor((c_acctbal + 1000) / 2000) AS BIGINT))
         |    < $L AS violates_l
         |FROM customer GROUP BY 1, 2""".stripMargin,
    "privacy_tcloseness" ->
      s"""WITH banded AS (
         |  SELECT c_nationkey, c_mktsegment,
         |    CAST(floor((c_acctbal + 1000) / 2000) AS BIGINT) AS band
         |  FROM customer),
         |g AS (SELECT band, CAST(count(*) AS BIGINT) AS g
         |      FROM banded GROUP BY 1),
         |t AS (SELECT CAST(sum(g) AS BIGINT) AS nn,
         |             CAST(count(*) AS BIGINT) AS m FROM g),
         |cls AS (SELECT c_nationkey, c_mktsegment, count(*) AS class_size
         |        FROM banded GROUP BY 1, 2),
         |cell AS (SELECT c_nationkey, c_mktsegment, band,
         |           CAST(count(*) AS BIGINT) AS c
         |         FROM banded GROUP BY 1, 2, 3),
         |cum AS (
         |  SELECT cls.c_nationkey, cls.c_mktsegment, cls.class_size, t.m,
         |    sum(coalesce(cell.c, 0) * t.nn - g.g * cls.class_size)
         |      OVER (PARTITION BY cls.c_nationkey, cls.c_mktsegment
         |            ORDER BY g.band
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |    cls.class_size * t.nn AS den
         |  FROM cls CROSS JOIN g CROSS JOIN t
         |  LEFT JOIN cell ON cell.c_nationkey = cls.c_nationkey
         |    AND cell.c_mktsegment = cls.c_mktsegment AND cell.band = g.band),
         |agg AS (
         |  SELECT c_nationkey, c_mktsegment, class_size, m,
         |    CAST(sum(CAST(floor(abs(CAST(cum AS DOUBLE)) * 1e6 / den + 0.5)
         |      AS BIGINT)) AS BIGINT) AS t_sum
         |  FROM cum GROUP BY 1, 2, 3, 4)
         |SELECT c_nationkey, c_mktsegment, class_size,
         |  CASE WHEN m > 1
         |    THEN CAST(floor(CAST(t_sum AS DOUBLE) / (m - 1) + 0.5) AS BIGINT)
         |    ELSE 0 END AS emd_micro,
         |  CASE WHEN m > 1
         |    THEN CAST(floor(CAST(t_sum AS DOUBLE) / (m - 1) + 0.5) AS BIGINT)
         |    ELSE 0 END > ${(Tclose * 1e6).toLong} AS violates_t
         |FROM agg""".stripMargin,
    "privacy_kanon" ->
      s"""SELECT c_nationkey, c_mktsegment, count(*) AS class_size,
         |  count(*) < $K AS violates
         |FROM customer GROUP BY 1, 2""".stripMargin,
    "privacy_kanon_generalize" ->
      s"""WITH census AS (
         |  SELECT c_nationkey, c_mktsegment, count(*) AS class_size
         |  FROM customer GROUP BY 1, 2)
         |SELECT c_nationkey, c_mktsegment AS segment, class_size,
         |  false AS generalized, false AS residual
         |FROM census WHERE class_size >= $K
         |UNION ALL
         |SELECT c_nationkey, '*' AS segment,
         |  CAST(sum(class_size) AS BIGINT) AS class_size, true AS generalized,
         |  sum(class_size) < $K AS residual
         |FROM census WHERE class_size < $K
         |GROUP BY c_nationkey""".stripMargin)
}
