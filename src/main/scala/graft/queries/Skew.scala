package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Skew mitigation by key salting ([EXT]). When one join key carries a
  * disproportionate share of a 100 TB fact table, the hash shuffle
  * sends that share to ONE reducer — the straggler that dominates the
  * stage. Salting splits each hot key into NSalt sub-keys:
  *
  *   fact side:  salt = pmod(hash(unique_row_id), NSalt)   (spreads rows)
  *   dim side:   replicated ×NSalt via explode              (bounded blowup)
  *   join on (key, salt)  ⇒ hot key's rows land on NSalt reducers.
  *
  * The salt derives from a per-row attribute (deterministic — never
  * rand(), which breaks retry idempotence and spec replay). Results
  * are provably identical to the unsalted join; the DuckDB oracle runs
  * the plain join. AQE's skewedJoin handles moderate skew at runtime;
  * explicit salting is the belt-and-braces form for known-pathological
  * keys (the null-key / power-law-user case in event logs).
  */
object Skew {

  private val NSalt = 8

  /** orders⋈customer on custkey, salted, rolled up to nation. */
  def joinSalted(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .withColumn("salt", pmod(hash(col("o_orderkey")), lit(NSalt)))
    val c = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_nationkey"),
        explode(array((0 until NSalt).map(lit): _*)).as("salt"))
    o.join(c, o("o_custkey") === c("c_custkey") && o("salt") === c("salt"))
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("sum_price"))
  }

  /** Two-phase salted AGGREGATION — the skewed-groupBy twin of
    * [[joinSalted]]: when one group key holds a disproportionate share
    * of rows AND the aggregate can't partially combine enough (e.g.
    * exact distinct-count state concentrates on the hot reducer),
    * aggregate first on (key, salt) — the hot key's state builds on
    * NSalt reducers — then combine the per-salt partials on the now
    * tiny (|keys|×NSalt) table. Distinct users survives two-phasing
    * because the salt derives from user_id itself, so equal users
    * never split across salts. Results provably ≡ the direct groupBy;
    * DuckDB runs the plain form.
    */
  def aggSalted(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
      .withColumn("salt", pmod(hash(col("user_id")), lit(NSalt)))
    e.groupBy("event_type", "salt")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("du"),
        sum("value").as("sv"))
      .groupBy("event_type")
      .agg(sum("n").as("n_events"),
        sum("du").as("n_users"),
        round(sum("sv"), 2).as("sum_value"))
  }

  /** SKEW DIAGNOSIS — the pre-flight report an operator reads BEFORE
    * choosing salting / AQE skew-join for a 100 TB run: the per-key
    * row-count distribution of the event log's shuffle key (user_id)
    * as one summary row — key count, total rows, the heaviest key and
    * its count, mean, exact p50/p90/p99, and the max/mean skew ratio
    * that decides whether a plain hash shuffle stragglers.
    *
    * Scale design: one partially-aggregated count shuffle to key
    * cardinality, then a single global agg over the (bounded) per-key
    * count table — the percentile state is that table, which is the
    * same working set any skew analysis must touch. argmax rides the
    * same agg as max(struct(c, -key)) — no second pass, deterministic
    * min-key tiebreak. Exact interpolated percentiles (Spark
    * `percentile` ≡ DuckDB `quantile_cont`, the Advanced.scala
    * precedent) keep the row under the hash gate.
    */
  def skewDiagnose(s: SparkSession, d: String): DataFrame = {
    val c = Tables.events(s, d).groupBy("user_id").agg(count(lit(1)).as("c"))
    c.agg(
        count(lit(1)).as("n_keys"),
        sum("c").as("n_rows"),
        max(struct(col("c").as("c"), (-col("user_id")).as("nk"))).as("mx"),
        expr("percentile(c, array(0.5, 0.9, 0.99))").as("ps"))
      .select(
        col("n_keys"), col("n_rows"),
        col("mx.c").as("max_c"), (-col("mx.nk")).as("top_key"),
        round(col("n_rows") / col("n_keys"), 4).as("mean_c"),
        round(col("ps")(0), 4).as("p50_c"),
        round(col("ps")(1), 4).as("p90_c"),
        round(col("ps")(2), 4).as("p99_c"),
        round(col("mx.c") / (col("n_rows") / col("n_keys")), 4).as("skew_ratio"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_salted" -> joinSalted,
    "agg_salted" -> aggSalted,
    "skew_diagnose" -> skewDiagnose)

  def oracleSql: Map[String, String] = Map(
    "join_salted" ->
      """SELECT c_nationkey, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_nationkey""".stripMargin,
    "agg_salted" ->
      """SELECT event_type, count(*) AS n_events,
        |  count(DISTINCT user_id) AS n_users,
        |  round(sum(value), 2) AS sum_value
        |FROM events GROUP BY event_type""".stripMargin,
    "skew_diagnose" ->
      """WITH c AS (SELECT user_id, count(*) AS c FROM events GROUP BY user_id)
        |SELECT CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(sum(c) AS BIGINT) AS n_rows,
        |  max(c) AS max_c,
        |  (SELECT user_id FROM c WHERE c = (SELECT max(c) FROM c)
        |   ORDER BY user_id LIMIT 1) AS top_key,
        |  round(CAST(sum(c) AS DOUBLE) / count(*), 4) AS mean_c,
        |  round(quantile_cont(c, 0.5), 4) AS p50_c,
        |  round(quantile_cont(c, 0.9), 4) AS p90_c,
        |  round(quantile_cont(c, 0.99), 4) AS p99_c,
        |  round(max(c) / (CAST(sum(c) AS DOUBLE) / count(*)), 4) AS skew_ratio
        |FROM c""".stripMargin)
}
