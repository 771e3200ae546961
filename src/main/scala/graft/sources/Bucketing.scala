package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Bucketed table layout ([EXT]) — the co-located join strategy. A
  * fact⋈fact join on an un-bucketed layout shuffles BOTH sides on the
  * key every time it runs; bucketing pays that shuffle once at write
  * time (`bucketBy(n, key)` + `sortBy`), after which every join or
  * aggregation on the bucket key is exchange-free: Catalyst sees the
  * matching `HashPartitioning` output and plans a sort-merge join with
  * zero Exchange nodes (BucketingSpec asserts this).
  *
  * At 100 TB this is the difference between re-shuffling the corpus
  * per query and reading co-located buckets: the canonical layout for
  * a fact table joined repeatedly on the same key. Bucket count sizes
  * to target-partition bytes at scale (here 8 for local tests).
  */
object Bucketing {

  /** Write orders and customer bucketed+sorted by custkey into the
    * session catalog (idempotent within a session; clears stale
    * warehouse directories left by previous JVMs — the in-memory
    * catalog forgets tables the filesystem still holds).
    */
  def ensureBucketed(s: SparkSession, d: String, nBuckets: Int = 8): Unit = {
    def write(name: String, df: DataFrame, key: String): Unit =
      if (!s.catalog.tableExists(name)) {
        val wh = s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
        val stale = new java.io.File(s"$wh/$name")
        if (stale.exists()) {
          def rm(f: java.io.File): Unit = {
            Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
          }
          rm(stale)
        }
        df.write.mode(SaveMode.Overwrite)
          .bucketBy(nBuckets, key).sortBy(key)
          .saveAsTable(name)
      }
    write("orders_bkt", Tables.orders(s, d), "o_custkey")
    write("customer_bkt", Tables.customer(s, d), "c_custkey")
  }

  /** orders⋈customer on the bucket key — plans with NO Exchange on
    * either side (both inputs already hash-partitioned by the key).
    */
  def bucketedJoin(s: SparkSession, d: String): DataFrame = {
    ensureBucketed(s, d)
    s.table("orders_bkt")
      .join(s.table("customer_bkt"), col("o_custkey") === col("c_custkey"))
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("sum_price"))
  }
}
