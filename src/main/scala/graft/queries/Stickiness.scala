package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** DAU/MAU engagement stickiness [EXT] — per observed day: distinct
  * daily actives, trailing-30-day distinct actives, and the
  * stickiness ratio (micro) — THE product-health metric next to
  * retention ([[EventOps]] events_retention is cohort-anchored;
  * stickiness is calendar-anchored).
  *
  * Scale shape: the trailing window is EQUI-IZED — each (user, day)
  * activity contributes itself to the 30 calendar days it counts
  * toward (bounded 30× fan-out of the already-deduplicated
  * user-day frame), then one hash agg per day with a distinct-user
  * count. No non-equi join, no per-day rescan; the day spine is
  * calendar-bounded at any corpus size.
  */
object Stickiness {

  val WindowDays = 30

  def dauMau(s: SparkSession, d: String): DataFrame = {
    val ud = Tables.events(s, d)
      .select(expr("ts DIV 86400000000000").as("day"), col("user_id"))
      .distinct()
    val days = ud.select("day").distinct()
    val dau = ud.groupBy("day").agg(countDistinct("user_id").as("dau"))
    val mau = ud
      .select(col("user_id"),
        explode(expr(s"sequence(day, day + ${WindowDays - 1})")).as("day"))
      .join(days, Seq("day"), "left_semi") // only observed days report
      .groupBy("day").agg(countDistinct("user_id").as("mau"))
    dau.join(mau, "day")
      .select(col("day"), col("dau"), col("mau"),
        expr("(dau * 1000000) DIV mau").as("stickiness_micro"))
  }

  /** ROLLING Dn retention — for every day: actives, and the share
    * still active exactly 1 and 7 days later (classic D1/D7, the
    * calendar-rolling complement of [[EventOps]]' cohort-anchored
    * events_retention). Pure equi-joins of the deduplicated user-day
    * frame against itself shifted by the horizon; rates are integer
    * micro ratios. Days too close to the end of the observed window
    * still report (their rate is genuinely what was observed).
    */
  def retentionDn(s: SparkSession, d: String): DataFrame = {
    val ud = Tables.events(s, d)
      .select(expr("ts DIV 86400000000000").as("day"), col("user_id"))
      .distinct()
    def shifted(k: Int, name: String) = ud
      .select((col("day") - k).as("day"), col("user_id"), lit(1L).as(name))
    ud.join(shifted(1, "r1"), Seq("day", "user_id"), "left")
      .join(shifted(7, "r7"), Seq("day", "user_id"), "left")
      .groupBy("day")
      .agg(count(lit(1)).as("n_active"),
        sum(coalesce(col("r1"), lit(0L))).as("n_d1"),
        sum(coalesce(col("r7"), lit(0L))).as("n_d7"))
      .select(col("day"), col("n_active"), col("n_d1"), col("n_d7"),
        expr("(n_d1 * 1000000) DIV n_active").as("d1_micro"),
        expr("(n_d7 * 1000000) DIV n_active").as("d7_micro"))
  }

  /** User-growth curve — per day: first-time users and the cumulative
    * unique-user count (the acquisition chart). First-seen day is one
    * hash agg per user; the cumulative sum runs over the
    * calendar-bounded day frame.
    */
  def userGrowth(s: SparkSession, d: String): DataFrame = {
    val firstSeen = Tables.events(s, d)
      .select(expr("ts DIV 86400000000000").as("day"), col("user_id"))
      .groupBy("user_id").agg(min("day").as("day"))
      .groupBy("day").agg(count(lit(1)).as("new_users"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("day")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    firstSeen.withColumn("cum_users", sum("new_users").over(w))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dau_mau" -> dauMau,
    "retention_dn" -> retentionDn,
    "user_growth" -> userGrowth)

  def oracleSql: Map[String, String] = Map(
    "user_growth" ->
      """WITH fs AS (
        |  SELECT user_id,
        |    min(CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT))
        |      AS day
        |  FROM events GROUP BY user_id),
        |nu AS (SELECT day, count(*) AS new_users FROM fs GROUP BY day)
        |SELECT day, new_users,
        |  CAST(sum(new_users) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_users
        |FROM nu""".stripMargin,
    "retention_dn" ->
      """WITH ud AS (
        |  SELECT DISTINCT CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400)
        |    AS BIGINT) AS day, user_id
        |  FROM events)
        |SELECT a.day, count(*) AS n_active,
        |  CAST(sum(CASE WHEN b1.user_id IS NULL THEN 0 ELSE 1 END)
        |    AS BIGINT) AS n_d1,
        |  CAST(sum(CASE WHEN b7.user_id IS NULL THEN 0 ELSE 1 END)
        |    AS BIGINT) AS n_d7,
        |  CAST(sum(CASE WHEN b1.user_id IS NULL THEN 0 ELSE 1 END)
        |    * 1000000 // count(*) AS BIGINT) AS d1_micro,
        |  CAST(sum(CASE WHEN b7.user_id IS NULL THEN 0 ELSE 1 END)
        |    * 1000000 // count(*) AS BIGINT) AS d7_micro
        |FROM ud a
        |LEFT JOIN ud b1 ON b1.user_id = a.user_id AND b1.day = a.day + 1
        |LEFT JOIN ud b7 ON b7.user_id = a.user_id AND b7.day = a.day + 7
        |GROUP BY a.day""".stripMargin,
    "dau_mau" ->
      s"""WITH ud AS (
         |  SELECT DISTINCT CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400)
         |    AS BIGINT) AS day, user_id
         |  FROM events),
         |days AS (SELECT DISTINCT day FROM ud),
         |dau AS (SELECT day, count(DISTINCT user_id) AS dau
         |        FROM ud GROUP BY day),
         |contrib AS (
         |  SELECT u.user_id, g.day
         |  FROM ud u, unnest(generate_series(u.day,
         |         u.day + ${WindowDays - 1})) AS g(day)
         |  WHERE g.day IN (SELECT day FROM days)),
         |mau AS (SELECT day, count(DISTINCT user_id) AS mau
         |        FROM contrib GROUP BY day)
         |SELECT dau.day, dau.dau, mau.mau,
         |  CAST((dau.dau * 1000000) // mau.mau AS BIGINT) AS stickiness_micro
         |FROM dau JOIN mau ON dau.day = mau.day""".stripMargin)
}
