package graft

import org.apache.spark.sql.functions._

/** AQE skew-join: the runtime complement to Skew.joinSalted's explicit
  * salting. With a power-law key, AQE must detect the oversized shuffle
  * partition after the map stage and split it (SortMergeJoin flagged
  * skew=true) — no query rewrite, correct results. Thresholds are
  * lowered so local test volumes trigger the same decision a 100 TB
  * hot key would.
  */
class SkewSpec extends SparkSuite {

  test("AQE splits the hot-key partition at runtime (skew=true SMJ)") {
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.coalescePartitions.enabled")
    val saved = keys.map(k => k -> util.Try(spark.conf.get(k)).toOption)
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8kb")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4kb")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

      // 100k rows on ONE key + 10k uniform rows over 1000 keys; a
      // 64-byte payload keeps the hot partition's compressed shuffle
      // size above the (lowered) skew threshold
      val fact = spark.range(0, 110000).select(
        when(col("id") < 100000, lit(7L)).otherwise(col("id") % 1000).as("k"),
        rpad(concat(lit("payload_"), col("id")), 64, "x").as("v"))
      val dim = spark.range(0, 1000).select(col("id").as("k"),
        concat(lit("dim_"), col("id")).as("name"))
      // max(v) keeps the payload column alive through the join shuffle
      // (count alone would let column pruning drop it pre-exchange)
      val joined = fact.join(dim, "k").groupBy("name")
        .agg(count(lit(1)).as("n"), max("v").as("mx"))
      val rows = joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"AQE did not flag the skewed join:\n$plan")
      // hot key lands on dim_7: 100k hot + 10 uniform hits
      // (ids 100000..109999 with id%1000==7)
      val hot = rows.find(_.getString(0) == "dim_7").map(_.getLong(1))
      assert(hot.contains(100000L + 10L), s"wrong hot-key count: $hot")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("skewDiagnose ≡ Scala recount of the per-key distribution") {
    val row = graft.queries.Skew.skewDiagnose(spark, sfDir).collect().head
    val counts = graft.core.Tables.events(spark, sfDir)
      .groupBy("user_id").count().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(row.getLong(0) === counts.length.toLong)
    assert(row.getLong(1) === counts.map(_._2).sum)
    val maxC = counts.map(_._2).max
    assert(row.getLong(2) === maxC)
    assert(row.getLong(3) === counts.filter(_._2 == maxC).map(_._1).min)
    val mean = counts.map(_._2).sum.toDouble / counts.length
    assert(math.abs(row.getDouble(4) - mean) < 1e-3)
    assert(math.abs(row.getDouble(8) - maxC / mean) < 1e-3)
    // percentiles ordered and bracketed by min/max
    val (p50, p90, p99) = (row.getDouble(5), row.getDouble(6), row.getDouble(7))
    assert(p50 <= p90 && p90 <= p99)
    assert(p50 >= counts.map(_._2).min.toDouble && p99 <= maxC.toDouble)
  }

  test("agg_salted: two-phase salted aggregation ≡ direct groupBy") {
    val salted = graft.queries.Skew.aggSalted(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val direct = graft.core.Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        round(sum("value"), 2).as("sum_value"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(salted.keySet === direct.keySet)
    salted.foreach { case (k, (n, du, sv)) =>
      assert((n, du) === ((direct(k)._1, direct(k)._2)), s"counts differ for $k")
      assert(math.abs(sv - direct(k)._3) < 1e-6, s"sum differs for $k")
    }
  }
}
