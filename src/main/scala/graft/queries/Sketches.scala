package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Approximate/sketch aggregates ([EXT]): HyperLogLog distinct counts
  * and t-digest-style quantiles. These are the aggregates that make
  * 100 TB interactive: fixed-size mergeable state (KB per group)
  * instead of exact distinct's shuffle of every key.
  *
  * `hll_merge` demonstrates the canonical warehouse pattern: sketches
  * are built per fine-grained cell (event_type × day — in production,
  * per partition/file at ingest), persisted, then MERGED later with
  * `hll_union_agg` to answer coarser rollups without rescanning raw
  * data. The merge is associative — exactly the partial-aggregation
  * shape Spark's hash aggregate exploits.
  *
  * Approximation ⇒ not DuckDB-hash-matchable: these entries omit
  * `oracleSql` (driver records rows-only), and SketchesSpec asserts
  * the estimates land within the sketches' published error bounds of
  * the exact answers.
  */
object Sketches {

  /** Per event_type: HLL distinct users (rsd 2%), approximate value
    * percentiles, plus exact row count for scale context.
    */
  def approxDistinct(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
        approx_percentile(col("value"), lit(0.5), lit(1000)).as("p50_value"),
        approx_percentile(col("value"), lit(0.99), lit(1000)).as("p99_value"))

  /** Two-level sketch rollup: build Datasketches HLL per
    * (event_type, day), union-merge to event_type, estimate. The
    * day-level sketch build and the merge are separate aggregations —
    * at scale the first runs at ingest, the second at query time.
    */
  def hllMerge(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .withColumn("day", expr("ts DIV 86400000000000"))
      .groupBy("event_type", "day")
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
    daily
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("merged_users"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "approx_distinct" -> approxDistinct,
    "hll_merge" -> hllMerge)

  /** Approximate results — no SQL oracle by design (rows-only check);
    * accuracy is spec-asserted in SketchesSpec.
    */
  def oracleSql: Map[String, String] = Map.empty
}
