package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.sources.Bucketing

/** Bucketed layout: the join on the bucket key must be exchange-free
  * on the bucketed sides, and results must equal the plain join.
  */
class BucketingSpec extends SparkSuite {

  test("bucketed fact-fact join plans without shuffling the bucketed sides") {
    // disable broadcast so the join genuinely exercises co-location
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = Bucketing.bucketedJoin(spark, sfDir)
      val join = df.queryExecution.executedPlan.toString
      // the SMJ inputs read buckets directly — no Exchange below the join
      val joinIdx = join.indexOf("SortMergeJoin")
      assert(joinIdx >= 0, join)
      val below = join.substring(joinIdx)
      assert(!below.contains("Exchange hashpartitioning(o_custkey") &&
        !below.contains("Exchange hashpartitioning(c_custkey"),
        s"bucketed join must not re-shuffle its inputs:\n$join")
      assert(join.contains("SelectedBucketsCount") || join.contains("Bucketed: true"),
        s"scan must be bucket-aware:\n$join")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed join results equal the plain parquet join") {
    val bucketed = Bucketing.bucketedJoin(spark, sfDir).collect()
      .map(r => r.getAs[Number](0).longValue -> (r.getLong(1), r.getDouble(2))).toMap
    val plain = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .groupBy("c_nationkey")
      .agg(count(lit(1)), round(sum("o_totalprice"), 2)).collect()
      .map(r => r.getAs[Number](0).longValue -> (r.getLong(1), r.getDouble(2))).toMap
    assert(bucketed === plain)
  }
}
