package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
object ProbeIncr {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    import graft.queries.Similarity
    val e = graft.core.Tables.embeddings(spark, d)
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $tag: ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    // Stage A: signatures+explode only (public test hook below mirrors
    // the bandsOf inside incrementalEmbeddingNew)
    val sigs = Similarity.probeBuckets(e)
    sigs.count()
    time("signature+explode warm") { sigs.count() }
    // Stage B: full pipeline
    val batch = e.filter(col("vec_id") % 5 === 0)
    val corpus = e.filter(col("vec_id") % 5 =!= 0)
    val full = Similarity.incrementalEmbeddingNew(batch, corpus, 0.45, lshCandidates = true)
    full.count()
    time("incremental full warm") { full.count() }
    spark.stop()
  }
}
