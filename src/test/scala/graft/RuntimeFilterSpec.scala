package graft

import org.apache.spark.sql.functions._

/** Runtime row-level join pruning: with a selective filter on the
  * small (creation) side of a shuffle join, Catalyst injects a
  * bloom_filter_might_contain predicate on the large (application)
  * side, discarding non-joining rows BEFORE the shuffle — at 100 TB
  * this is the difference between shuffling the whole fact table and
  * shuffling only the ~matching fraction. Local thresholds are lowered
  * (the defaults assume 10 GB scans); on a real cluster the defaults
  * fire on their own.
  */
class RuntimeFilterSpec extends SparkSuite {
  import spark.implicits._

  test("selective dim filter injects a bloom filter on the fact side of a SMJ") {
    val dir = "/tmp/graft_rtf"
    (0L until 200000L).map(k => (k, k % 1024, s"p$k"))
      .toDF("k", "fk", "payload").write.mode("overwrite").parquet(s"$dir/fact")
    (0L until 1024L).map(k => (k, k % 16, s"d$k"))
      .toDF("id", "cat", "name").write.mode("overwrite").parquet(s"$dir/dim")

    val confs = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter(col("cat") === 3)
      val joined = fact.join(dim, col("fk") === col("id"))
        .groupBy("cat").agg(count(lit(1)).as("n"), sum("k").as("sk"))
      // rendered as might_contain(bloom_filter_agg-subquery, xxhash64(fk))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
        s"expected an injected runtime bloom filter, got:\n$plan")
      val got = joined.collect()
      // semantics unchanged: 64 matching dims × ~195-196 fact rows each
      assert(got.length === 1 && got.head.getLong(1) === 12500L)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
