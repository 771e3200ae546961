package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Declarative data-quality assertion suite ([EXT]) — the
  * dbt-test / Great-Expectations pattern: a fixed battery of named
  * rules (range, domain, not-null, primary-key uniqueness,
  * referential integrity) evaluated in bulk, one result row per rule
  * with checked/failed counts. A pipeline gates ingest on
  * `bool_and(pass)`; the per-rule counts are the triage report.
  *
  * Scale: every rule is a single aggregate over its table (the PK
  * rule one distinct-count, the FK rule one anti-join count) — no
  * row-level materialization of violations; the output is
  * |rules| rows regardless of input size.
  */
object DataQuality {

  def dqChecks(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)

    def rule(name: String, checked: DataFrame): DataFrame =
      checked.select(lit(name).as("rule"), col("n_checked"), col("n_failed"))

    val qtyRange = rule("lineitem_quantity_in_1_50",
      l.agg(count(lit(1)).as("n_checked"),
        sum(when(!col("l_quantity").between(1, 50), 1L).otherwise(0L)).as("n_failed")))
    val discRange = rule("lineitem_discount_in_0_0.1",
      l.agg(count(lit(1)).as("n_checked"),
        sum(when(!col("l_discount").between(0.0, 0.1), 1L).otherwise(0L)).as("n_failed")))
    val keyNotNull = rule("lineitem_orderkey_not_null",
      l.agg(count(lit(1)).as("n_checked"),
        sum(when(col("l_orderkey").isNull, 1L).otherwise(0L)).as("n_failed")))
    val pkUnique = rule("lineitem_pk_unique",
      l.agg(count(lit(1)).as("n_checked"),
        (count(lit(1)) - countDistinct(col("l_orderkey"), col("l_linenumber")))
          .as("n_failed")))
    val fkOrders = rule("orders_custkey_in_customer",
      o.join(c, col("o_custkey") === col("c_custkey"), "left_anti")
        .agg(lit(0L).as("dummy"), count(lit(1)).as("n_failed"))
        .crossJoin(broadcast(o.agg(count(lit(1)).as("n_checked"))))
        .select(col("n_checked"), col("n_failed")))
    val prioDomain = rule("orders_priority_in_domain",
      o.agg(count(lit(1)).as("n_checked"),
        sum(when(!col("o_orderpriority").isin(
          "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"), 1L)
          .otherwise(0L)).as("n_failed")))

    qtyRange.unionAll(discRange).unionAll(keyNotNull).unionAll(pkUnique)
      .unionAll(fkOrders).unionAll(prioDomain)
      .withColumn("pass", col("n_failed") === 0)
  }

  /** Source-freshness report (the dbt `source freshness` check) over
    * the event streams: per event_type, the most recent event and its
    * lag behind the corpus watermark; stale if the stream has been
    * silent for over 7 days at the watermark. One hash agg + a 1-row
    * broadcast watermark.
    */
  def sourceFreshness(s: SparkSession, d: String): DataFrame = {
    val NanosPerSec = 1000000000L
    val perType = Tables.events(s, d)
      .groupBy("event_type").agg(max("ts").as("last_ts"))
    val watermark = perType.agg(max("last_ts").as("wm"))
    perType.crossJoin(broadcast(watermark))
      .select(col("event_type"),
        expr(s"last_ts DIV $NanosPerSec").as("last_s"),
        expr(s"(wm - last_ts) DIV $NanosPerSec").as("lag_s"))
      .withColumn("stale", col("lag_s") > 7L * 86400L)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dq_checks" -> dqChecks,
    "source_freshness" -> sourceFreshness)

  def oracleSql: Map[String, String] = Map(
    "dq_checks" ->
      """SELECT 'lineitem_quantity_in_1_50' AS rule, count(*) AS n_checked,
        |  CAST(sum(CASE WHEN NOT (l_quantity BETWEEN 1 AND 50) THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_failed,
        |  CAST(sum(CASE WHEN NOT (l_quantity BETWEEN 1 AND 50) THEN 1 ELSE 0 END)
        |    AS BIGINT) = 0 AS pass
        |FROM lineitem
        |UNION ALL
        |SELECT 'lineitem_discount_in_0_0.1', count(*),
        |  CAST(sum(CASE WHEN NOT (l_discount BETWEEN 0.0 AND 0.1) THEN 1 ELSE 0 END)
        |    AS BIGINT),
        |  CAST(sum(CASE WHEN NOT (l_discount BETWEEN 0.0 AND 0.1) THEN 1 ELSE 0 END)
        |    AS BIGINT) = 0
        |FROM lineitem
        |UNION ALL
        |SELECT 'lineitem_orderkey_not_null', count(*),
        |  CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) = 0
        |FROM lineitem
        |UNION ALL
        |SELECT 'lineitem_pk_unique', count(*),
        |  count(*) - count(DISTINCT (l_orderkey, l_linenumber)),
        |  count(*) - count(DISTINCT (l_orderkey, l_linenumber)) = 0
        |FROM lineitem
        |UNION ALL
        |SELECT 'orders_custkey_in_customer',
        |  (SELECT count(*) FROM orders),
        |  (SELECT count(*) FROM orders o
        |   WHERE NOT EXISTS (SELECT 1 FROM customer c
        |                     WHERE c.c_custkey = o.o_custkey)),
        |  (SELECT count(*) FROM orders o
        |   WHERE NOT EXISTS (SELECT 1 FROM customer c
        |                     WHERE c.c_custkey = o.o_custkey)) = 0
        |UNION ALL
        |SELECT 'orders_priority_in_domain', count(*),
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN
        |    ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW')
        |    THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN
        |    ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW')
        |    THEN 1 ELSE 0 END) AS BIGINT) = 0
        |FROM orders""".stripMargin,
    "source_freshness" ->
      """WITH pt AS (
        |  SELECT event_type, max(ts) AS last_ts FROM events GROUP BY 1),
        |wm AS (SELECT max(last_ts) AS wm FROM pt)
        |SELECT event_type,
        |  CAST(floor(epoch(CAST(last_ts AS TIMESTAMP))) AS BIGINT) AS last_s,
        |  CAST(floor(epoch(wm - last_ts)) AS BIGINT) AS lag_s,
        |  CAST(floor(epoch(wm - last_ts)) AS BIGINT) > 7 * 86400 AS stale
        |FROM pt, wm""".stripMargin)
}
