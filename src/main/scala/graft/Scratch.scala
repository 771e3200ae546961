package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.queries.Dedup

/** Throwaway profiling entry point (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Dedup.shingleDocs(spark, d).filter(size(col("sh")) > 0)
    time("shingles count")(println(docs.count()))
    val bands = docs
      .select(col("doc_id"), col("sh"), { graft.functions.MinHashBuckets.register(spark); expr("minhash_buckets(sh)").as("bks") })
      .select(col("doc_id"), posexplode(col("bks")))
      .toDF("doc_id", "band", "bucket")
    time("bands")(println(bands.count()))
    val cached = bands.cache(); cached.count()
    val cand = cached.as("x")
      .join(cached.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
    time("cand pairs")(println(cand.count()))
    time("cand distinct")(println(cand.distinct().count()))
    time("full minhash")(println(Dedup.dedupMinhash(spark, d).count()))
    spark.stop()
  }
}
