package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.queries.Dsir

/** Dev scratch: stage-by-stage timing of the DSIR weight chain. */
object ProfileDsir {
  def time[T](label: String)(f: => T): Unit = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s  ($r)")
  }

  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, d)
    time("docs.count")(docs.count())
    time("docs.count 2")(docs.count())

    val toks = docs.select(col("doc_id"), col("lang"),
      filter(split(col("text"), "[^\\p{L}]+"), w => length(w) > 0).as("ws"))
    time("tokenize only")(toks.select(sum(size(col("ws")))).collect()(0).getLong(0))
    time("tokenize only 2")(toks.select(sum(size(col("ws")))).collect()(0).getLong(0))

    val grams = toks.select(col("doc_id"), col("lang"),
      concat(col("ws"),
        when(size(col("ws")) >= 2,
          transform(sequence(lit(1), size(col("ws")) - 1),
            i => concat_ws(" ", element_at(col("ws"), i), element_at(col("ws"), i + 1))))
          .otherwise(array().cast("array<string>"))).as("gs"))
    time("grams")(grams.select(sum(size(col("gs")))).collect()(0).getLong(0))
    time("grams 2")(grams.select(sum(size(col("gs")))).collect()(0).getLong(0))

    val ex = grams.select(col("doc_id"), col("lang"), explode(col("gs")).as("g"))
    time("explode")(ex.count())
    val bk = ex.select(col("doc_id"), col("lang"),
      (conv(substring(md5(col("g")), 1, 12), 16, 10).cast("long") % 128).as("b"))
    time("explode+md5")(bk.count())
    time("explode+md5 2")(bk.count())
    val bc = bk.groupBy("doc_id", "lang", "b").agg(count(lit(1)).as("nb"))
    time("bucketCounts")(bc.count())
    time("bucketCounts 2")(bc.count())

    // variant A: explode plain tokens only
    val exTok = toks.select(col("doc_id"), explode(col("ws")).as("g"))
    time("explode toks only")(exTok.count())
    time("explode toks only 2")(exTok.count())

    // variant B: materialize the gram arrays first, then explode
    val gsMat = graft.core.Checkpoints.stable(grams)
    time("explode from checkpoint")(
      gsMat.select(col("doc_id"), explode(col("gs")).as("g")).count())
    time("explode from checkpoint 2")(
      gsMat.select(col("doc_id"), explode(col("gs")).as("g")).count())

    // variant C: bigrams from a self-zip instead of element_at lambda
    val grams2 = toks.select(col("doc_id"), col("lang"),
      concat(col("ws"),
        when(size(col("ws")) >= 2,
          zip_with(slice(col("ws"), lit(1), size(col("ws")) - 1),
            slice(col("ws"), lit(2), size(col("ws")) - 1),
            (a, b) => concat(a, lit(" "), b)))
          .otherwise(array().cast("array<string>"))).as("gs"))
    time("grams zip_with")(grams2.select(sum(size(col("gs")))).collect()(0).getLong(0))
    val exZip = grams2.select(col("doc_id"), explode(col("gs")).as("g"))
    time("explode zip_with")(exZip.count())
    time("explode zip_with 2")(exZip.count())

    (1 to 3).foreach { i =>
      time(s"dsir_weights full $i")(Dsir.dsirWeights(spark, d).count())
    }
    spark.stop()
  }
}
