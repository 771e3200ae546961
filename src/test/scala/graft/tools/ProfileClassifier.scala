package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratch: stage-by-stage timing of the classifier pipeline
  * (featurize vs GD rounds vs scoring).
  */
object ProfileClassifier {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up
    graft.queries.Classifier.classifierTrain(spark, d).count()
    import org.apache.spark.sql.functions._
    import graft.core.Tables
    import graft.queries.Dedup
    (1 to 3).foreach { rep =>
      println(s"--- rep $rep ---")
      val docs = Tables.documents(spark, d)
      time("tokenize only") {
        docs.select(col("doc_id"), Dedup.tokensCol(col("text")).as("ws"))
          .select(sum(size(col("ws")))).head()
      }
      time("tok+explode+grp1") {
        docs.select(col("doc_id"), Dedup.tokensCol(col("text")).as("ws"))
          .where(size(col("ws")) > 0)
          .select(col("doc_id"), explode(col("ws")).as("tok"))
          .groupBy(col("doc_id"),
            pmod(conv(substring(md5(col("tok")), 1, 6), 16, 10).cast("long"), lit(64)).cast("int").as("dim"))
          .agg(count(lit(1)).as("c")).select(sum("c")).head()
      }
      val stopArr = array(Seq("the", "a", "of", "and", "to", "in", "is", "it").map(lit): _*)
      def fzPlan = {
        val dimOf = (t: org.apache.spark.sql.Column) =>
          pmod(conv(substring(md5(t), 1, 6), 16, 10).cast("long"), lit(64)).cast("int")
        docs
          .select(col("doc_id"), Dedup.tokensCol(col("text")).as("ws"))
          .where(size(col("ws")) > 0)
          .select(col("doc_id"), col("ws"), size(col("ws")).cast("double").as("n"))
          .select(col("doc_id"), col("n"),
            (size(filter(col("ws"), w => array_contains(stopArr, w))).cast("double") / col("n")
              >= 0.11).cast("double").as("y"),
            explode(col("ws")).as("tok"))
          .groupBy(col("doc_id"), col("y"), col("n"), dimOf(col("tok")).as("dim"))
          .agg(count(lit(1)).cast("double").as("c"))
      }
      time("grp1 with y col")(fzPlan.select(sum("c")).head())
      time("grp2 map rebuild") {
        fzPlan
          .groupBy("doc_id", "y", "n")
          .agg(map_from_entries(collect_list(struct(col("dim"), col("c")))).as("m"))
          .select(col("doc_id"), col("y"),
            concat(
              transform(sequence(lit(0), lit(63)),
                dm => coalesce(element_at(col("m"), dm), lit(0.0)) / col("n") * lit(64.0)),
              array(lit(1.0))).as("x"))
          .select(count(lit(1))).head()
      }
      val fz = time("featurize+stable")(
        graft.queries.Classifier.featurize(spark, d))
      time("featurize count")(fz.count())
      val w = time("train 24 rounds")(
        graft.queries.Classifier.trainWeights(fz))
      println(s"[prof] |w| = ${w.count(_ != 0.0)}")
      fz.unpersist(false)
    }
    spark.stop()
  }
}
