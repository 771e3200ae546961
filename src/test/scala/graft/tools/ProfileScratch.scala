package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.queries.{Cluster, Dedup}

/** Dev scratch: stage-by-stage timing of the clustering pipelines. */
object ProfileScratch {
  def time[T](label: String)(f: => T): Unit = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s  ($r)")
  }

  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm-up
    Cluster.dedupCluster(spark, d).count()
    Cluster.dedupClusterMinhash(spark, d).count()
    Dedup.dedupNgram(spark, d).count()

    (1 to 3).foreach { rep =>
      println(s"--- rep $rep ---")
      val docs = Tables.documents(spark, d)
      time("stage: shingle only")(
        Dedup.shingleDocs(spark, d)
          .select(coalesce(sum(size(col("sh"))), lit(0L))).head().getLong(0))
      time("stage: explode+count")(
        Dedup.shingleDocs(spark, d)
          .select(col("doc_id"), explode_outer(col("sh")).as("shingle"))
          .filter(col("shingle").isNotNull).count())
      time("stage: groupBy shingle")(
        Dedup.shingleDocs(spark, d)
          .select(col("doc_id"), explode_outer(col("sh")).as("shingle"))
          .filter(col("shingle").isNotNull)
          .groupBy("shingle").agg(count(lit(1)).as("n"))
          .filter(col("n") > 1).count())
      time("ngramScored edges")(
        Dedup.ngramScored(docs).filter(col("jac") >= 0.6).count())
      time("dedup_ngram")(Dedup.dedupNgram(spark, d).count())
      time("dedup_cluster full")(Cluster.dedupCluster(spark, d).count())
      time("dedup_cluster_minhash full")(Cluster.dedupClusterMinhash(spark, d).count())
      time("dedup_keep full")(Cluster.dedupKeep(spark, d).count())
    }
    spark.stop()
  }
}
