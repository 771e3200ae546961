package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev harness: stage-by-stage timing of similarityJoin at a SF dir. */
object ProfileSim {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val tau = 0.5
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.WordShingles.register(spark)
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select(col("doc_id"), expr("word_shingles(text)").as("sh"))
      .filter(size(col("sh")) > 0)
    time("shingle-count")(println("  docs=" + docs.count()))
    val ex = docs.select(col("doc_id"), size(col("sh")).as("nsh"),
      explode(col("sh")).as("shingle"))
    time("explode-count")(println("  ex=" + ex.count()))
    // stage copies mirror Dedup.similarityJoin — keep in sync
    val dfreq = ex.groupBy("shingle").agg(count(lit(1)).as("df"))
    val byRarity = Window.partitionBy("doc_id").orderBy(col("df").asc, col("shingle").asc)
    val prefix = ex.join(dfreq, "shingle")
      .withColumn("rk", row_number().over(byRarity))
      .filter(col("rk") <= col("nsh") - ceil(lit(tau) * col("nsh")) + 1)
    time("prefix")(println("  prefix=" + prefix.count()))
    val cand = prefix.groupBy("shingle")
      .agg(collect_list(struct(col("doc_id"), col("nsh"), col("rk"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(col("ids"), posexplode(col("ids")).as(Seq("i", "a")))
      .select(explode(filter(transform(slice(col("ids"), col("i") + 2, size(col("ids"))),
        b => when(col("a")("doc_id") < b("doc_id"),
          struct(col("a")("doc_id").as("doc_a"), b("doc_id").as("doc_b"),
            col("a")("nsh").as("na"), b("nsh").as("nb"),
            col("a")("rk").as("ra"), b("rk").as("rb")))
          .otherwise(
            struct(b("doc_id").as("doc_a"), col("a")("doc_id").as("doc_b"),
              b("nsh").as("na"), col("a")("nsh").as("nb"),
              b("rk").as("ra"), col("a")("rk").as("rb")))),
        p => least(p("na"), p("nb")) >= ceil(lit(tau) * greatest(p("na"), p("nb"))) &&
          lit(1) + least(p("na") - p("ra"), p("nb") - p("rb")) >=
            ceil(lit(tau / (1 + tau)) * (p("na") + p("nb"))))).as("p"))
      .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      .distinct()
    time("candidates")(println("  cand=" + cand.count()))
    val full = graft.queries.Dedup.similarityJoin(
      graft.core.Tables.documents(spark, sfDir), tau)
    time("full")(println("  out=" + full.count()))
    spark.stop()
  }
}
