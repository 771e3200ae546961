package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Behavioral-diagnostics operators ([EXT]): burst detection (the
  * bot/scraper screen), the language-ID confusion matrix (model eval
  * against labels), and event-type co-occurrence lift (the
  * cross-feature adoption matrix). All integer-exact.
  */
object Behavior {

  /** Burst flag threshold: max hourly rate ≥ 3× the user's mean. */
  val BurstRatioMicro = 3000000L

  /** Per-user activity burstiness: hourly event cells → the user's
    * busiest hour versus their mean active-hour rate
    * (max·n_hours/total, micro). A human browses; a bot bursts.
    * One groupBy(user, hour) pass, then user-bounded cells. */
  def anomalyBurst(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("user_id"), expr("ts DIV 3600000000000").as("hour"))
      .groupBy("user_id", "hour").agg(count(lit(1)).as("c"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_hours"), max("c").as("max_hour"),
        sum("c").as("n_events"))
      .select(col("user_id"), col("n_hours"), col("max_hour"),
        col("n_events"),
        expr("max_hour * 1000000L * n_hours div n_events")
          .as("burst_micro"))
      .withColumn("is_burst", col("burst_micro") >= BurstRatioMicro)

  /** Language-ID eval: the confusion matrix of the n-gram lang_id
    * heuristic against the labeled lang column, with per-true-label
    * recall. Composes the registered lang_id pass — the eval readout
    * a model owner ships beside the model. */
  def langidConfusion(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("lang")
    TextOps.langId(s, d)
      .groupBy("lang", "pred_lang").agg(count(lit(1)).as("n"))
      .withColumn("n_lang", sum("n").over(w))
      .select(col("lang"), col("pred_lang"), col("n"), col("n_lang"),
        expr("n * 1000000L div n_lang").as("share_micro"),
        (col("lang") === col("pred_lang")).as("is_correct"))
  }

  /** Event-type co-occurrence lift over users: for every type pair,
    * users doing both versus independence —
    * lift = n_ab·N/(n_a·n_b) in micro. Type-bounded cells from one
    * distinct (user, type) pass + a user-keyed self-join. */
  def eventTypeLift(s: SparkSession, d: String): DataFrame = {
    val ut = Tables.events(s, d)
      .select(col("user_id"), col("event_type")).distinct()
    val nUsers = ut.select("user_id").distinct().agg(count(lit(1)).as("nu"))
    val sizes = ut.groupBy(col("event_type").as("t")).agg(count(lit(1)).as("nt"))
    val pairs = ut.join(ut.select(col("user_id"), col("event_type").as("tb")),
        "user_id")
      .filter(col("event_type") < col("tb"))
      .groupBy(col("event_type").as("ta"), col("tb"))
      .agg(count(lit(1)).as("n_both"))
    pairs
      .join(sizes.select(col("t").as("ta"), col("nt").as("n_a")), "ta")
      .join(sizes.select(col("t").as("tb"), col("nt").as("n_b")), "tb")
      .crossJoin(broadcast(nUsers))
      .select(col("ta"), col("tb"), col("n_both"), col("n_a"), col("n_b"),
        col("nu").as("n_users"),
        expr("n_both * nu * 1000000L div (n_a * n_b)").as("lift_micro"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "anomaly_burst" -> anomalyBurst,
    "langid_confusion" -> langidConfusion,
    "event_type_lift" -> eventTypeLift)

  def oracleSql: Map[String, String] = Map(
    "anomaly_burst" ->
      s"""WITH cells AS (
         |  SELECT user_id,
         |    CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 3600) AS BIGINT)
         |      AS hour, count(*) AS c
         |  FROM events GROUP BY 1, 2),
         |u AS (
         |  SELECT user_id, count(*) AS n_hours,
         |    CAST(max(c) AS BIGINT) AS max_hour,
         |    CAST(sum(c) AS BIGINT) AS n_events
         |  FROM cells GROUP BY user_id)
         |SELECT user_id, n_hours, max_hour, n_events,
         |  CAST(max_hour * 1000000 * n_hours // n_events AS BIGINT)
         |    AS burst_micro,
         |  max_hour * 1000000 * n_hours // n_events >= $BurstRatioMicro
         |    AS is_burst
         |FROM u""".stripMargin,
    "langid_confusion" -> {
      val langIdSql = TextOps.oracleSql("lang_id")
      s"""WITH li AS ($langIdSql)
         |SELECT lang, pred_lang, count(*) AS n,
         |  CAST(sum(count(*)) OVER (PARTITION BY lang) AS BIGINT) AS n_lang,
         |  CAST(count(*) * 1000000
         |    // sum(count(*)) OVER (PARTITION BY lang) AS BIGINT)
         |    AS share_micro,
         |  lang = pred_lang AS is_correct
         |FROM li GROUP BY lang, pred_lang""".stripMargin
    },
    "event_type_lift" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        |nu AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS nu FROM ut),
        |sizes AS (SELECT event_type AS t, count(*) AS nt FROM ut GROUP BY 1),
        |pairs AS (
        |  SELECT a.event_type AS ta, b.event_type AS tb, count(*) AS n_both
        |  FROM ut a JOIN ut b ON b.user_id = a.user_id
        |    AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT p.ta, p.tb, p.n_both, sa.nt AS n_a, sb.nt AS n_b,
        |  nu.nu AS n_users,
        |  CAST(p.n_both * nu.nu * 1000000 // (sa.nt * sb.nt) AS BIGINT)
        |    AS lift_micro
        |FROM pairs p JOIN sizes sa ON sa.t = p.ta
        |JOIN sizes sb ON sb.t = p.tb CROSS JOIN nu""".stripMargin)
}
