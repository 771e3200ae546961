package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.core.Checkpoints.StableOps

/** Sequential-pattern mining ([EXT]) — PrefixSpan-class support
  * counting (Pei et al. '01) for length-2 and length-3 event-type
  * subsequences: a user supports ⟨a,b⟩ when some a-event precedes
  * some b-event (NON-contiguous, unlike journey_paths' contiguous
  * n-grams), and ⟨a,b,c⟩ via the greedy witness — first a, earliest
  * b after it, any c after that (exists-semantics made deterministic,
  * the standard PrefixSpan projection order).
  *
  * Exactness: supports are integer user counts; ratios are
  * micro-floor. Scale shape: the alphabet is the (small) event-type
  * set, so everything reduces to per-(user, type) first/last cells —
  * one |E| window pass, then joins whose fan-out is bounded by
  * |types|² per user; the only |E|-sized join probes the raw stream
  * once for the earliest-b-after-a witness. No collects.
  */
object SeqMine {

  /** Minimum support as a per-mille of the user base. */
  val MinSupportPermille = 50L

  /** Frequent ⟨a,b⟩ and ⟨a,b,c⟩ subsequences with user support. */
  def frequentSeq(s: SparkSession, d: String): DataFrame = {
    val rnW = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_type").as("t"),
        col("ts"), col("event_id"))
      .withColumn("rn", row_number().over(rnW))
      .select("user_id", "t", "rn").stable
    // per-(user, type) first/last cells — the whole mining state
    val ext = ev.groupBy("user_id", "t")
      .agg(min("rn").as("first_rn"), max("rn").as("last_rn")).stable
    val users = ev.select(col("user_id")).distinct()
      .agg(count(lit(1)).as("n_users"))
    val a = ext.select(col("user_id"), col("t").as("ta"),
      col("first_rn").as("fa"))
    val b = ext.select(col("user_id"), col("t").as("tb"),
      col("last_rn").as("lb"))
    val pair2 = a.join(b, "user_id").filter(col("fa") < col("lb"))
      .groupBy(col("ta"), col("tb"))
      .agg(count(lit(1)).as("support"))
      .select(concat(col("ta"), lit(">"), col("tb")).as("seq"),
        lit(2L).as("len"), col("support"))
    // greedy witness for length 3: earliest b strictly after first a
    val eab = a.join(ev.select(col("user_id"), col("t").as("tb"),
        col("rn").as("rnb")), "user_id")
      .filter(col("rnb") > col("fa"))
      .groupBy("user_id", "ta", "tb").agg(min("rnb").as("eab"))
    val pair3 = eab.join(ext.select(col("user_id"), col("t").as("tc"),
        col("last_rn").as("lc")), "user_id")
      .filter(col("eab") < col("lc"))
      .groupBy("ta", "tb", "tc")
      .agg(count(lit(1)).as("support"))
      .select(concat(col("ta"), lit(">"), col("tb"), lit(">"), col("tc"))
        .as("seq"), lit(3L).as("len"), col("support"))
    pair2.unionAll(pair3).crossJoin(broadcast(users))
      .filter(col("support") * 1000 >= col("n_users") * MinSupportPermille)
      .select(col("seq"), col("len"), col("support"),
        expr("support * 1000000L div n_users").as("support_micro"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "frequent_seq" -> frequentSeq)

  def oracleSql: Map[String, String] = Map(
    "frequent_seq" ->
      s"""WITH ev AS MATERIALIZED (
         |  SELECT user_id, event_type AS t,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS rn
         |  FROM events),
         |ext AS MATERIALIZED (
         |  SELECT user_id, t, min(rn) AS first_rn, max(rn) AS last_rn
         |  FROM ev GROUP BY 1, 2),
         |users AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
         |          FROM ev),
         |p2 AS (
         |  SELECT a.t || '>' || b.t AS seq, CAST(2 AS BIGINT) AS len,
         |    count(*) AS support
         |  FROM ext a JOIN ext b ON b.user_id = a.user_id
         |    AND a.first_rn < b.last_rn
         |  GROUP BY 1),
         |eab AS (
         |  SELECT a.user_id, a.t AS ta, e.t AS tb, min(e.rn) AS eab
         |  FROM ext a JOIN ev e ON e.user_id = a.user_id
         |    AND e.rn > a.first_rn
         |  GROUP BY 1, 2, 3),
         |p3 AS (
         |  SELECT x.ta || '>' || x.tb || '>' || c.t AS seq,
         |    CAST(3 AS BIGINT) AS len, count(*) AS support
         |  FROM eab x JOIN ext c ON c.user_id = x.user_id
         |    AND x.eab < c.last_rn
         |  GROUP BY 1)
         |SELECT seq, len, CAST(support AS BIGINT) AS support,
         |  CAST(support * 1000000 // n_users AS BIGINT) AS support_micro
         |FROM (SELECT * FROM p2 UNION ALL SELECT * FROM p3) u
         |CROSS JOIN users
         |WHERE support * 1000 >= n_users * $MinSupportPermille""".stripMargin)
}
