package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Supervised-learning feature builders ([EXT]): the two operators a
  * training-set assembly pipeline needs beyond scaling/rolling
  * windows (EventOps.feature_scale / feature_rolling) — category
  * target encoding without self-leakage, and deterministic negative
  * sampling for implicit-feedback training pairs.
  */
object Features {

  /** Leave-one-out target encoding (the Kaggle/CatBoost-lineage
    * mean encoder): each order's priority category is encoded as the
    * mean o_totalprice of OTHER orders in that category —
    * (Σ_cat − x)/(n_cat − 1) — so a row never sees its own target
    * (the leakage split_leakfree guards against at the split level,
    * prevented here at the feature level). Singleton categories fall
    * back to the global mean of the others (the same formula over
    * the whole table).
    *
    * One shuffle on the category key (window sum+count); the global
    * fallback is a 1-row broadcast. Encoded value floor-quantized at
    * 4dp for the hash gate.
    */
  def featureTargetEncode(s: SparkSession, d: String): DataFrame = {
    val byCat = Window.partitionBy("o_orderpriority")
    // prices are 2dp decimals: per-row cent quantization is exact, and
    // the int64 sums are merge-order independent — a raw double window
    // sum flips the 4dp floor on some rows (caught by the hash gate)
    val cents = floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      .withColumn("x_c", cents)
      .withColumn("cat_sum_c", sum("x_c").over(byCat))
      .withColumn("cat_n", count(lit(1)).over(byCat))
    val g = Tables.orders(s, d).select(cents.as("x_c"))
      .agg(sum("x_c").as("g_sum_c"), count(lit(1)).as("g_n"))
    val loo = when(col("cat_n") > 1,
      (col("cat_sum_c") - col("x_c")).cast("double") / 100.0 / (col("cat_n") - 1))
      .otherwise((col("g_sum_c") - col("x_c")).cast("double") / 100.0 / (col("g_n") - 1))
    o.crossJoin(broadcast(g))
      .select(col("o_orderkey"), col("o_orderpriority"),
        (floor(loo * 10000 + 0.5) / 10000.0).as("priority_te"))
  }

  private val NegK = 3   // negatives per user
  /** Target candidate-pool size per user — the SCALE-INVARIANT form of
    * the bucket knob: the fan-out derives from |parts| inside the plan
    * (buckets = max(1, |parts| div [[TargetCands]])), so each user
    * draws ~TargetCands candidates at ANY corpus size. The previous
    * fixed 64-bucket constant made candidate volume |users|·|parts|/64
    * — bilinear in scale; at 100× the per-user pool would be 100×.
    */
  private[graft] val TargetCands = 128L

  /** Deterministic negative sampling for implicit-feedback pairs
    * (user, purchased part → k parts the user did NOT buy). Sampling
    * must be reproducible across runs/backfills, so randomness is
    * md5-derived: each part lands in one of nb = |parts| div
    * [[TargetCands]] hash buckets (a 1-row broadcast aggregate — the
    * knob that keeps per-user candidates ~constant and the candidate
    * join linear instead of |users|×|parts|), each user draws
    * candidates from ITS md5 bucket only, positives are anti-joined
    * away, and the top [[NegK]] by md5(user-part) are the user's
    * negatives.
    */
  def sampleNegatives(s: SparkSession, d: String): DataFrame = {
    val h32 = (c: org.apache.spark.sql.Column) =>
      conv(substring(md5(c), 1, 8), 16, 10).cast("long")
    val positives = Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("user_id"), col("l_partkey").as("part_id"))
      .distinct()
    val nb = Tables.part(s, d)
      .agg(greatest(lit(1L), expr(s"count(1) div $TargetCands")).as("nb"))
    val users = positives.select("user_id").distinct()
      .crossJoin(broadcast(nb))
      .withColumn("bucket", h32(concat(lit("u"), col("user_id"))) % col("nb"))
      .drop("nb")
    val parts = Tables.part(s, d)
      .select(col("p_partkey").as("part_id"))
      .crossJoin(broadcast(nb))
      .withColumn("bucket", h32(concat(lit("p"), col("part_id"))) % col("nb"))
      .drop("nb")
    val cands = users.join(parts, "bucket").drop("bucket")
    val rankW = Window.partitionBy("user_id")
      .orderBy(col("rk").asc, col("part_id").asc)
    cands.join(positives, Seq("user_id", "part_id"), "left_anti")
      .withColumn("rk",
        h32(concat(col("user_id").cast("string"), lit("-"),
          col("part_id").cast("string"))))
      .withColumn("rn", row_number().over(rankW))
      .filter(col("rn") <= NegK)
      .select(col("user_id"), col("part_id").as("neg_part_id"),
        col("rn").cast("long").as("rn"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "feature_target_encode" -> featureTargetEncode,
    "sample_negatives" -> sampleNegatives)

  def oracleSql: Map[String, String] = Map(
    "feature_target_encode" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_orderpriority,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS x_c,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      OVER (PARTITION BY o_orderpriority) AS BIGINT) AS cat_sum_c,
        |    count(*) OVER (PARTITION BY o_orderpriority) AS cat_n
        |  FROM orders),
        |g AS (SELECT CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |        AS BIGINT) AS g_sum_c,
        |      count(*) AS g_n FROM orders)
        |SELECT o_orderkey, o_orderpriority,
        |  floor((CASE WHEN cat_n > 1
        |         THEN CAST(cat_sum_c - x_c AS DOUBLE) / 100.0 / (cat_n - 1)
        |         ELSE CAST(g_sum_c - x_c AS DOUBLE) / 100.0 / (g_n - 1) END)
        |    * 10000 + 0.5) / 10000.0 AS priority_te
        |FROM o, g""".stripMargin,
    "sample_negatives" ->
      s"""WITH positives AS (
        |  SELECT DISTINCT o.o_custkey AS user_id, l.l_partkey AS part_id
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |nb AS (SELECT CAST(greatest(1, count(*) // $TargetCands) AS BIGINT)
        |       AS nb FROM part),
        |users AS (
        |  SELECT DISTINCT user_id,
        |    CAST(('0x' || substr(md5('u' || CAST(user_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) % nb.nb AS bucket
        |  FROM positives, nb),
        |parts AS (
        |  SELECT p_partkey AS part_id,
        |    CAST(('0x' || substr(md5('p' || CAST(p_partkey AS VARCHAR)), 1, 8))
        |      AS BIGINT) % nb.nb AS bucket
        |  FROM part, nb),
        |cands AS (
        |  SELECT u.user_id, p.part_id
        |  FROM users u JOIN parts p USING (bucket)
        |  WHERE NOT EXISTS (SELECT 1 FROM positives x
        |                    WHERE x.user_id = u.user_id
        |                      AND x.part_id = p.part_id)),
        |ranked AS (
        |  SELECT user_id, part_id,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) || '-'
        |          || CAST(part_id AS VARCHAR)), 1, 8)) AS BIGINT) ASC,
        |        part_id ASC) AS rn
        |  FROM cands)
        |SELECT user_id, part_id AS neg_part_id, rn
        |FROM ranked WHERE rn <= 3""".stripMargin)
}
