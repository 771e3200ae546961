package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Join-size estimation by coordinated sampling ([EXT]) — the
  * planner-style cardinality estimate a warehouse computes BEFORE
  * running a fact-fact join: both sides hash the join key with the
  * SAME md5 (coordinated/correlated sampling, Vengerov et al.), keep
  * only keys in the bottom-k of the hash order, sum the exact
  * per-key frequency products over that key sample, and scale by
  * D/k where D is the KMV distinct-key estimate from the k-th
  * smallest hash. Emits the estimate next to the exact join size and
  * the signed relative error — the audit row; at 100 TB you skip the
  * exact column and keep the estimator (two key-only scans, k-bounded
  * state).
  *
  * Exactness: membership depends only on md5 order and the estimate
  * on integer counts + one fixed double ratio chain — micro-quantized,
  * fully oracle-gated (the quantile_sketch bottom-k convention
  * applied to the key domain).
  */
object JoinEst {

  /** Key-sample size (bottom-k of the hash order). */
  val K = 256

  private val HashSpace = math.pow(2.0, 48.0)

  def joinSizeEst(s: SparkSession, d: String): DataFrame = {
    def keyed(df: DataFrame, key: String, cnt: String) = df
      .groupBy(col(key).as("k")).agg(count(lit(1)).as(cnt))
      .withColumn("h",
        conv(substring(md5(concat(lit("jse:"), col("k").cast("string"))),
          1, 12), 16, 10).cast("long"))
    val a = keyed(Tables.orders(s, d), "o_orderkey", "fa")
    val b = keyed(Tables.lineitem(s, d), "l_orderkey", "fb")
    // the union key domain in hash order; bottom-k is the coordinated
    // sample BOTH sides agree on (same seed, same hash)
    val dom = a.select("k", "h").unionAll(b.select("k", "h")).distinct()
      .orderBy(col("h").asc, col("k").asc).limit(K)
    val kth = dom.agg(max("h").as("hk"), count(lit(1)).as("n_samp"))
    val samp = dom.join(a.select("k", "fa"), Seq("k"), "left")
      .join(b.select("k", "fb"), Seq("k"), "left")
      .agg(sum(coalesce(col("fa"), lit(0L)) * coalesce(col("fb"), lit(0L)))
        .as("sum_samp"))
    val exact = Tables.orders(s, d)
      .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .agg(count(lit(1)).as("exact_rows"))
    val estExpr = floor(col("sum_samp").cast("double")
      * ((col("n_samp").cast("double") - 1) * HashSpace / col("hk"))
      / col("n_samp") + lit(0.5)).cast("long")
    samp.crossJoin(broadcast(kth)).crossJoin(broadcast(exact))
      .select(col("n_samp"), col("sum_samp"), col("exact_rows"),
        // KMV distinct estimate: (k-1) * 2^48 / h_k
        floor((col("n_samp").cast("double") - 1) * HashSpace
          / col("hk") + lit(0.5)).cast("long").as("d_est"),
        estExpr.as("est_rows"),
        floor((estExpr.cast("double") - col("exact_rows"))
          / col("exact_rows") * 1000000 + lit(0.5)).cast("long")
          .as("err_micro"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_size_est" -> joinSizeEst)

  def oracleSql: Map[String, String] = Map(
    "join_size_est" ->
      s"""WITH a AS (
         |  SELECT o_orderkey AS k, count(*) AS fa,
         |    CAST(('0x' || substr(md5('jse:' || CAST(o_orderkey AS VARCHAR)),
         |      1, 12))::UBIGINT AS BIGINT) AS h
         |  FROM orders GROUP BY 1),
         |b AS (
         |  SELECT l_orderkey AS k, count(*) AS fb,
         |    CAST(('0x' || substr(md5('jse:' || CAST(l_orderkey AS VARCHAR)),
         |      1, 12))::UBIGINT AS BIGINT) AS h
         |  FROM lineitem GROUP BY 1),
         |dom AS (
         |  SELECT k, h FROM (
         |    SELECT k, h FROM a UNION SELECT k, h FROM b)
         |  ORDER BY h ASC, k ASC LIMIT $K),
         |kth AS (SELECT CAST(max(h) AS BIGINT) AS hk,
         |               CAST(count(*) AS BIGINT) AS n_samp FROM dom),
         |samp AS (
         |  SELECT CAST(sum(coalesce(a.fa, 0) * coalesce(b.fb, 0)) AS BIGINT)
         |    AS sum_samp
         |  FROM dom LEFT JOIN a USING (k) LEFT JOIN b USING (k)),
         |ex AS (
         |  SELECT CAST(count(*) AS BIGINT) AS exact_rows
         |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey)
         |SELECT n_samp, sum_samp, exact_rows,
         |  CAST(floor((CAST(n_samp AS DOUBLE) - 1) * ${HashSpace.toLong}
         |    / hk + 0.5) AS BIGINT) AS d_est,
         |  CAST(floor(CAST(sum_samp AS DOUBLE) * ((CAST(n_samp AS DOUBLE) - 1)
         |    * ${HashSpace.toLong} / hk) / n_samp + 0.5) AS BIGINT) AS est_rows,
         |  CAST(floor((floor(CAST(sum_samp AS DOUBLE)
         |      * ((CAST(n_samp AS DOUBLE) - 1) * ${HashSpace.toLong} / hk)
         |      / n_samp + 0.5) - exact_rows)
         |    / exact_rows * 1000000 + 0.5) AS BIGINT) AS err_micro
         |FROM samp CROSS JOIN kth CROSS JOIN ex""".stripMargin)
}
