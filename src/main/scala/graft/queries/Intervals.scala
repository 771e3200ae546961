package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Interval analytics [EXT] — merge overlapping per-user activity
  * intervals (the gaps-and-islands pattern over EXPLICIT [start,
  * end) spans, complementing [[EventOps]] `events_session`, whose
  * islands are defined by inter-START gaps). Explicit-end merging
  * is what usage metering, on-call coverage, and GPU-occupancy
  * pipelines need: an event's span is its own duration, and a
  * short event inside a long one must NOT extend the island.
  *
  * Interval contract: each event spans [ts, ts + value×10min),
  * duration quantized at millisecond precision
  * (floor(value·1000+0.5) ms × 600) so both engines fold the same
  * integers. Islands: sort by (start, end, event_id); a row opens
  * a new island iff its start exceeds the running max end of ALL
  * previous rows (running max — not lag(end) — handles the
  * long-interval-covers-short-interval case). Ties in (start,
  * end) are order-independent: identical rows produce identical
  * flags whichever is scanned first. Within an island the union
  * of spans is contiguous by construction (each successive start
  * ≤ the running max end), so the island's coverage IS
  * [min start, max end) — no inner gaps to subtract.
  *
  * Scale design: one shuffle on user_id, then sort + two window
  * passes within partition; rows carry 4 longs. Island ids are
  * per-user running sums, so no global coordination; at 100 TB
  * the plan is a single hash partition by user — the same shape
  * as sessionization, which Spark runs at that scale routinely.
  */
object Intervals {

  /** ms-quantized duration: value × 10 minutes, floor 1 ms. */
  private def durUs: Column =
    greatest(floor(col("value") * 1000 + lit(0.5)).cast("long"), lit(1L)) * 600000L

  /** user_id, event_id, s, e, island (1-based per user). */
  private def islands(s: SparkSession, d: String): DataFrame = {
    val iv = Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        expr("ts DIV 1000").as("s"), col("value"))
      .withColumn("e", col("s") + durUs)
      .drop("value")
    val w = Window.partitionBy("user_id")
      .orderBy(col("s").asc, col("e").asc, col("event_id").asc)
    val prevMax = max(col("e")).over(w.rowsBetween(Window.unboundedPreceding, -1))
    iv.withColumn("flag",
        when(prevMax.isNull || prevMax < col("s"), 1L).otherwise(0L))
      .withColumn("island", sum(col("flag")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** One row per merged island: user_id, island (1-based per user),
    * island_start_us, island_end_us, n_events.
    */
  def intervalMerge(s: SparkSession, d: String): DataFrame =
    islands(s, d)
      .groupBy(col("user_id"), col("island"))
      .agg(min(col("s")).as("island_start_us"),
        max(col("e")).as("island_end_us"),
        count(lit(1)).as("n_events"))

  /** Per-user coverage report over the merged islands: island count,
    * covered microseconds (no double-count of overlaps), longest
    * island, and the busiest island's event count.
    */
  def intervalCoverage(s: SparkSession, d: String): DataFrame =
    intervalMerge(s, d)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_islands"),
        sum(col("island_end_us") - col("island_start_us")).as("covered_us"),
        max(col("island_end_us") - col("island_start_us")).as("max_island_us"),
        max(col("n_events")).as("max_island_events"))

  /** Interval-overlap JOIN between two interval sets — click spans ×
    * view spans of the same user (ad-attribution's "was the ad on
    * screen while the user clicked" shape). Intervals span
    * [ts, ts + value×1min); each is exploded to the hour buckets it
    * covers (≤9 — durations are data-bounded at 491 min), candidates
    * pair within (user_id, bucket), and each true overlap is COUNTED
    * EXACTLY ONCE without a distinct: a pair is kept only in the
    * bucket where the LATER interval starts (greatest(s_a, s_b) DIV
    * hour — both intervals provably cover that bucket, and it is
    * unique per pair). Output: user_id, id_a, id_b, overlap_us.
    *
    * Scale shape: the classic temporal-binning join — shuffle on
    * (user, hour) with bounded fan-out, never user-level cross
    * products; the bucket-attribution filter replaces the
    * deduplicating shuffle a naive emit-all-buckets plan needs.
    */
  def joinIntervalOverlap(s: SparkSession, d: String): DataFrame = {
    val H = 3600000000L // µs per hour
    def side(et: String, idc: String, sc: String, ec: String): DataFrame =
      Tables.events(s, d)
        .filter(col("event_type") === et)
        .select(col("user_id"), col("event_id").as(idc),
          expr("ts DIV 1000").as(sc), col("value"))
        .withColumn(ec, col(sc) +
          greatest(floor(col("value") * 1000 + lit(0.5)).cast("long"), lit(1L)) * 60000L)
        .drop("value")
        .withColumn("bucket",
          explode(expr(s"sequence($sc DIV $H, ($ec - 1) DIV $H)")))
    val a = side("click", "id_a", "sa", "ea")
    val b = side("view", "id_b", "sb", "eb")
    a.join(b, Seq("user_id", "bucket"))
      .filter(col("sa") < col("eb") && col("sb") < col("ea") &&
        col("bucket") === expr(s"greatest(sa, sb) DIV $H"))
      .select(col("user_id"), col("id_a"), col("id_b"),
        (least(col("ea"), col("eb")) - greatest(col("sa"), col("sb")))
          .as("overlap_us"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "interval_merge" -> intervalMerge,
    "interval_coverage" -> intervalCoverage,
    "join_interval_overlap" -> joinIntervalOverlap)

  private val islandsSql: String =
    """WITH iv AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS s,
      |    epoch_us(ts)
      |      + greatest(CAST(floor(value * 1000 + 0.5) AS BIGINT), 1) * 600000
      |      AS e
      |  FROM events),
      |f AS (
      |  SELECT user_id, event_id, s, e,
      |    CASE WHEN max(e) OVER (PARTITION BY user_id
      |          ORDER BY s ASC, e ASC, event_id ASC
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) >= s
      |      THEN 0 ELSE 1 END AS flag
      |  FROM iv),
      |g AS (
      |  SELECT user_id, s, e,
      |    sum(flag) OVER (PARTITION BY user_id
      |      ORDER BY s ASC, e ASC, event_id ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      |  FROM f)
      |SELECT user_id, CAST(island AS BIGINT) AS island,
      |  min(s) AS island_start_us, max(e) AS island_end_us,
      |  count(*) AS n_events
      |FROM g GROUP BY user_id, island""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "join_interval_overlap" ->
      """WITH a AS (
        |  SELECT user_id, event_id AS id_a, epoch_us(ts) AS sa,
        |    epoch_us(ts)
        |      + greatest(CAST(floor(value*1000 + 0.5) AS BIGINT), 1) * 60000 AS ea
        |  FROM events WHERE event_type = 'click'),
        |b AS (
        |  SELECT user_id, event_id AS id_b, epoch_us(ts) AS sb,
        |    epoch_us(ts)
        |      + greatest(CAST(floor(value*1000 + 0.5) AS BIGINT), 1) * 60000 AS eb
        |  FROM events WHERE event_type = 'view')
        |SELECT a.user_id, id_a, id_b,
        |  least(ea, eb) - greatest(sa, sb) AS overlap_us
        |FROM a JOIN b ON a.user_id = b.user_id
        | AND sa < eb AND sb < ea""".stripMargin,
    "interval_merge" -> islandsSql,
    "interval_coverage" ->
      s"""WITH m AS ($islandsSql)
         |SELECT user_id, count(*) AS n_islands,
         |  CAST(sum(island_end_us - island_start_us) AS BIGINT) AS covered_us,
         |  max(island_end_us - island_start_us) AS max_island_us,
         |  max(n_events) AS max_island_events
         |FROM m GROUP BY user_id""".stripMargin)
}
