package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProbePipeline {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[probe] $name rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val docs = graft.core.Tables.documents(spark, d)
    val corpus = docs.filter(col("doc_id") >= 20)
    // warm the scan
    t("warm_scan") { corpus.count() }
    t("quality_kept(stage1 gate)") {
      graft.queries.TextOps.qualityPerDoc(corpus)
        .withColumn("thr", expr("percentile(quality, 0.25)")
          .over(org.apache.spark.sql.expressions.Window.partitionBy("lang")))
        .filter(col("quality") >= col("thr")).select("doc_id").count()
    }
    t("minhash_edges_on_corpus") {
      graft.queries.Dedup.minhashScored(corpus, 0.6)
        .filter(col("jac") >= 0.6).count()
    }
    t("full_pipeline_pretrain_minhash") {
      graft.queries.Pipeline.pipelinePretrainMinhash(spark, d).count()
    }
    t("full_again") {
      graft.queries.Pipeline.pipelinePretrainMinhash(spark, d).count()
    }
    spark.stop()
  }
}
