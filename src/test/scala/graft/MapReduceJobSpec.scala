package graft

import java.nio.file.Files

import org.apache.spark.TaskContext
import graft.core.{KV, MapReduceJob}

/** Parity tests for the MapReduce closure ABI, mirroring the
  * reference's test strategy (differential vs a naive sequential model,
  * fault injection, parallelism probe — test-mr.sh).
  */
class MapReduceJobSpec extends SparkSuite {
  import spark.implicits._

  private val docs = Seq(
    KV("d1", "the quick brown fox, the lazy dog!"),
    KV("d2", "héllo wörld — hello world"),
    KV("d3", ""),
    KV("d4", "a a a b 99 b"))

  private val wcMap: (String, String) => Seq[KV] =
    (_, text) => "[^\\p{L}]+".r.split(text).toSeq.filter(_.nonEmpty).map(w => KV(w, "1"))
  private val wcReduce: (String, Seq[String]) => String =
    (_, vs) => vs.size.toString

  /** Naive single-threaded model = mrsequential.go's role. */
  private def naiveWc(ds: Seq[KV]): Map[String, String] =
    ds.flatMap(r => wcMap(r.key, r.value))
      .groupBy(_.key)
      .map { case (k, vs) => k -> vs.size.toString }

  test("wc via run matches naive sequential model") {
    val got = MapReduceJob.run(spark.createDataset(docs), wcMap, wcReduce)
      .collect().map(kv => kv.key -> kv.value).toMap
    assert(got === naiveWc(docs))
  }

  test("runAssociative (combiner path) equals run (final-only path)") {
    val a = MapReduceJob.run(spark.createDataset(docs), wcMap, wcReduce)
      .collect().map(kv => kv.key -> kv.value).toSet
    val b = MapReduceJob.runAssociative(spark.createDataset(docs), wcMap,
      (x, y) => (x.toLong + y.toLong).toString)
      .collect().map(kv => kv.key -> kv.value).toSet
    assert(a === b)
  }

  test("reduce sees all values per key; value order is the app's job (crash-agg)") {
    // A5 semantics: reducef sorts values itself (crash.go:48-52)
    val aggReduce: (String, Seq[String]) => String =
      (_, vs) => vs.sorted.mkString(" ")
    val got = MapReduceJob.run(spark.createDataset(docs),
      (doc, text) => Seq(KV("a", doc), KV("c", text.length.toString)),
      aggReduce)
      .collect().map(kv => kv.key -> kv.value).toMap
    assert(got("a") === "d1 d2 d3 d4")
    assert(got("c") === docs.map(_.value.length.toString).sorted.mkString(" "))
  }

  test("fileRecords reads whole files with path keys (worker.go:102-109 parity)") {
    val dir = Files.createTempDirectory("mrin")
    Files.writeString(dir.resolve("f1.txt"), "alpha beta")
    Files.writeString(dir.resolve("f2.txt"), "gamma")
    val recs = MapReduceJob.fileRecords(spark, Seq(dir.toString)).collect()
    assert(recs.length === 2)
    assert(recs.forall(r => r.key.endsWith(".txt")))
    assert(recs.map(_.value).toSet === Set("alpha beta", "gamma"))
  }

  test("writeTextOutput emits 'key value' lines (worker.go:92 parity)") {
    val out = Files.createTempDirectory("mrout").toString + "/wc"
    val res = MapReduceJob.run(spark.createDataset(docs), wcMap, wcReduce)
    MapReduceJob.writeTextOutput(res, out, nReduce = 3)
    val lines = spark.read.text(out).as[String].collect().toSet
    assert(lines === naiveWc(docs).map { case (k, v) => s"$k $v" }.toSet)
  }

  test("task failure is retried and output matches no-fault run (crash.go analog)") {
    val noFault = MapReduceJob.run(spark.createDataset(docs), wcMap, wcReduce)
      .collect().map(kv => kv.key -> kv.value).toSet
    val base = wcMap // local copy — the lambda must not capture the suite
    val faultyMap: (String, String) => Seq[KV] = (doc, text) => {
      if (doc == "d1" && TaskContext.get() != null && TaskContext.get().attemptNumber() == 0)
        throw new RuntimeException("injected crash (first attempt)")
      base(doc, text)
    }
    val got = MapReduceJob.run(spark.createDataset(docs), faultyMap, wcReduce)
      .collect().map(kv => kv.key -> kv.value).toSet
    assert(got === noFault)
  }

  test("reduce-side failure is retried and output matches no-fault run (crash.go:45-55 analog)") {
    // The reference injects crashes in BOTH phases; a reducef throw
    // exercises the post-shuffle retry (shuffle-fetch replay) path.
    val clean = MapReduceJob.run(spark.createDataset(docs), wcMap, wcReduce)
      .collect().map(kv => kv.key -> kv.value).toSet
    val base = wcReduce
    val faultyReduce: (String, Seq[String]) => String = (k, vs) => {
      if (k == "the" && TaskContext.get() != null && TaskContext.get().attemptNumber() == 0)
        throw new RuntimeException("injected reduce crash (first attempt)")
      base(k, vs)
    }
    val got = MapReduceJob.run(spark.createDataset(docs), wcMap, faultyReduce)
      .collect().map(kv => kv.key -> kv.value).toSet
    assert(got === clean)
  }

  test("speculation knob (F11 backup tasks, master.go:111-127) runs green") {
    // The suite context is built with spark.speculation=true (the only
    // scope Spark offers — scheduler conf, fixed at context start); the
    // façade knob asserts that and the job result is unchanged.
    val got = MapReduceJob.run(spark.createDataset(docs), wcMap, wcReduce,
      speculation = true)
      .collect().map(kv => kv.key -> kv.value).toMap
    assert(got === naiveWc(docs))
    val gotAssoc = MapReduceJob.runAssociative(spark.createDataset(docs), wcMap,
      (x, y) => (x.toLong + y.toLong).toString, speculation = true)
      .collect().map(kv => kv.key -> kv.value).toMap
    assert(gotAssoc === naiveWc(docs))
  }

  test("writeTextOutput byKey hash-places lines by key (worker.go:113-117 parity)") {
    val out = Files.createTempDirectory("mrout").toString + "/wc_bykey"
    val res = MapReduceJob.run(spark.createDataset(docs), wcMap, wcReduce)
    MapReduceJob.writeTextOutput(res, out, nReduce = 3, byKey = true)
    val lines = spark.read.text(out).as[String].collect().toSet
    assert(lines === naiveWc(docs).map { case (k, v) => s"$k $v" }.toSet)
  }

  test("ServiceLoader plugin ABI: name-resolved apps match closure runs (mrworker.go:34-51 parity)") {
    val viaPlugin = MapReduceJob.runPlugin(spark.createDataset(docs), "wc")
      .collect().map(kv => kv.key -> kv.value).toMap
    assert(viaPlugin === naiveWc(docs))
    // second registry entry resolves independently
    val idx = MapReduceJob.runPlugin(spark.createDataset(docs), "indexer")
      .collect().map(kv => kv.key -> kv.value).toMap
    assert(idx("the") === "1 d1") // one doc contains "the"
    assert(idx("a") === "1 d4")
    val e = intercept[IllegalArgumentException](graft.core.MapReducePlugin.load("nope"))
    assert(e.getMessage.contains("wc") && e.getMessage.contains("indexer"))
  }

  test("map tasks run in parallel (mtiming analog)") {
    val probe = spark.sparkContext.collectionAccumulator[(Long, Long)]("spans")
    spark.sparkContext.parallelize(1 to 4, 4).foreachPartition { _ =>
      val t0 = System.currentTimeMillis()
      Thread.sleep(300)
      probe.add((t0, System.currentTimeMillis()))
    }
    val spans = probe.value
    assert(spans.size === 4)
    val overlapping = (for {
      i <- 0 until spans.size(); j <- 0 until spans.size() if i < j
      (a1, a2) = (spans.get(i)._1, spans.get(i)._2)
      (b1, b2) = (spans.get(j)._1, spans.get(j)._2)
    } yield a1 < b2 && b1 < a2).count(identity)
    assert(overlapping >= 1, s"no concurrent tasks observed: $spans")
  }

  test("A6/F11 executor-PROCESS death: SIGKILL'd executor JVM mid-map, job completes correctly (crash.go os.Exit parity)") {
    // the shared suite context is local[4,2] (one JVM) — a multi-
    // process cluster needs its own SparkContext, so the probe forks:
    // graft.tools.ExecutorDeathProbe runs local-cluster[2,1,1024],
    // halts one executor JVM mid-map via an atomically-claimed marker,
    // and exits 0 only if the job finished with sequential-model rows
    // a Spark distribution is required (the forked Worker launches
    // executors from it) — resolve from SPARK_HOME, falling back to
    // the CI image's /opt/spark; SKIP (not fail) on hosts without one
    // (ADVICE r13)
    val sparkHome = sys.env.getOrElse("SPARK_HOME", "/opt/spark")
    assume(new java.io.File(sparkHome, "bin").isDirectory,
      s"no Spark distribution at $sparkHome — probe skipped")
    val javaBin = new java.io.File(
      new java.io.File(System.getProperty("java.home"), "bin"), "java")
      .getAbsolutePath
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar")
      .flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx1g",
      // standalone Worker resolves the executor launch home from
      // spark.test.home / SPARK_HOME
      "-Dspark.test.home=" + sparkHome,
      "-cp", System.getProperty("java.class.path"),
      "graft.tools.ExecutorDeathProbe")
    val pb = new ProcessBuilder(cmd: _*)
    pb.environment().put("SPARK_HOME", sparkHome)
    // normally set by bin/load-spark-env.sh, which this direct java
    // launch bypasses; the Worker's executor command builder needs it
    pb.environment().put("SPARK_SCALA_VERSION", "2.13")
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = scala.io.Source.fromInputStream(p.getInputStream).mkString
    val code = p.waitFor()
    assert(code == 0 && out.contains("[executor-death] ok"),
      s"probe failed (exit $code):\n${out.takeRight(6000)}")
  }

  test("mr_pipeline stages under spark.graft.scratchDir when set (cluster-safe path)") {
    val root = Files.createTempDirectory("graft_scratch").toString
    spark.conf.set("spark.graft.scratchDir", root)
    try {
      val out = graft.queries.Parity.mrPipeline(spark, sfDir).collect()
      assert(out.nonEmpty)
      val staged = new java.io.File(root).listFiles()
      val names = staged.map(_.getName)
      // staged inputs are reclaimed once the sink write consumes them —
      // a corpus copy must not leak onto the shared root per run
      assert(!names.exists(_.startsWith("graft_mr_in-")),
        s"staged input dir leaked under $root")
      assert(names.exists(_.startsWith("graft_mr_out-")), s"no sink dir under $root")
      val outFiles = staged.find(_.getName.startsWith("graft_mr_out-")).get.listFiles()
      assert(outFiles.exists(_.getName.startsWith("mr-out-")), "sink wrote no mr-out-<r> files")
    } finally spark.conf.unset("spark.graft.scratchDir")
  }
}
