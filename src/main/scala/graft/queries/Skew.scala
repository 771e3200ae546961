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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_salted" -> joinSalted)

  def oracleSql: Map[String, String] = Map(
    "join_salted" ->
      """SELECT c_nationkey, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_nationkey""".stripMargin)
}
