package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** COLD-START measurement for the durable model store (dev tool, run
  * twice in SEPARATE JVMs — that separation IS the experiment):
  *
  * {{{
  * sbt "Test/runMain graft.tools.ModelStoreCold train <modelDir> <sf> <out>"
  * sbt "Test/runMain graft.tools.ModelStoreCold serve <modelDir> <sf> <out>"
  * }}}
  *
  * Phase `train` starts from an empty `modelDir`: every
  * ModelStore.cachedDurable family (tree splits, MF factors, item-CF
  * neighbor lists, classifier weights, BPE merges) misses the disk
  * store, trains, persists, and the serve query's rows are dumped to
  * `out`. Phase `serve` runs the SAME serve queries in a NEW JVM whose
  * session cache is empty by construction — the only warm tier is the
  * disk store. It asserts (a) ModelStore.diskHits == families and
  * retrains == 0 (the model really came from disk, proven by the
  * counters, not inferred from timing), (b) the served rows are
  * EXACTLY the train-phase rows (bidirectional except + counts), and
  * prints per-query wall seconds for the warm-start evidence row in
  * BASELINE.md.
  */
object ModelStoreCold {
  // one serve-side registry entry per cachedDurable family
  val ServeQueries: Seq[String] = Seq(
    "tree_predict", "mf_predict", "item_recommend", "classifier_predict",
    "bpe_encode")

  def main(args: Array[String]): Unit = {
    val Array(phase, modelDir, sfDir, outDir) = args.take(4)
    require(phase == "train" || phase == "serve", s"bad phase $phase")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.graft.modelDir", modelDir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val times = ServeQueries.map { name =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val n = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      if (phase == "train")
        df.write.mode("overwrite").parquet(s"$outDir/$name")
      else {
        val trained = spark.read.parquet(s"$outDir/$name")
        val extra = df.exceptAll(trained).count()
        val missing = trained.exceptAll(df).count()
        require(extra == 0 && missing == 0,
          s"$name: cold-served rows differ from trained (extra=$extra missing=$missing)")
      }
      f"$name=$sec%.2fs rows=$n"
    }
    val (hits, retrains) =
      (graft.core.ModelStore.diskHits.get(), graft.core.ModelStore.retrains.get())
    if (phase == "serve")
      require(hits == ServeQueries.size.toLong && retrains == 0L,
        s"serve phase must be all disk hits: hits=$hits retrains=$retrains")
    else
      require(retrains == ServeQueries.size.toLong && hits == 0L,
        s"train phase must be all retrains: hits=$hits retrains=$retrains")
    println(s"[modelstore-cold] phase=$phase disk_hits=$hits " +
      s"retrains=$retrains ${times.mkString(" ")}")
    spark.stop()
  }
}
