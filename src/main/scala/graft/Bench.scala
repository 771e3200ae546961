package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times the headline queries
  * (SparkEntry.benchQueries) on SPARK_GRAFT_SF_DIR and prints one JSON
  * line. Each query is fully executed via a count() action (the plans
  * end in aggregations/limits, so count materializes every operator).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // In-LOOP lineage truncations always checkpoint reliably
    // (Checkpoints.stableLoop — the r11/r13 eviction incidents);
    // cleanCheckpoints lets the ContextCleaner reclaim their files as
    // frames are GC'd over the 434-query run. SPARK_GRAFT_CKPT_DIR
    // relocates them (a cluster run points this at HDFS/S3 via
    // spark.graft.checkpointDir instead). One-shot `.stable` cuts
    // stay localCheckpoint — measured here: making them all reliable
    // cost ~2x on the stable-heavy trainer chains for zero benefit
    // within a single query.
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.speculation", "true") // stragglers; no-op in local mode
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_CKPT_DIR")
      .foreach(builder.config("spark.graft.loopCheckpointDir", _))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // dev-only restriction for re-pin protocol runs (BASELINE.md's
    // min-of-3 drift re-measurements need THIS tool's session config,
    // not TimeQuery's — the two are not comparable); unset = full
    // registry, which is what the driver runs
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.benchQueries.filter(SparkEntry.queries.contains)
      .filter(n => only.forall(_.contains(n)))
    // Cross-query block hygiene: iterative/stage-shared operators
    // truncate lineage via localCheckpoint, whose blocks hang off plan
    // leaves and BYPASS Dataset.unpersist/catalog cache — over a full
    // registry run (431+ queries x warm-up + 3 reps) they accumulate
    // in executor storage until eviction/GC pressure poisons later
    // queries' timings (the r11 dedup_cluster_minhash 17.2 s driver
    // reading vs 1.87 s isolated — same binary). Dropping leaked
    // persisted RDDs between executions makes each rep measure the
    // same clean-storage steady state regardless of registry position.
    // EXEMPT: blocks backing live ModelCache entries — cached model
    // frames are checkpoint-truncated, so their blocks are the only
    // copy; dropping one leaves the next serve-entry cache hit holding
    // a dead frame (ModelCache.liveRddIds documents the failure mode;
    // the sweep itself is shared so the exemption cannot drift).
    def clean(): Unit = graft.core.ModelCache.sweepLeakedBlocks(spark)
    // Warm-up pass: run EVERY benched query once, uncounted, so the
    // timed pass measures steady state (JIT + whole-stage-codegen
    // compilation + parquet footer caches excluded). One-shot codegen
    // compile is a per-JVM artifact — at the target scale a query's
    // stages compile once and then process terabytes, so steady state
    // is the number that predicts cluster throughput.
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, sfDir).count()
      catch { case _: Throwable => () } // failures surface in the timed pass
      clean()
    }
    // A failed query is recorded as -1 (never a plausible elapsed time)
    // and listed in "errors"; the process exits non-zero so a crashing
    // benchmark is never mistaken for a fast one.
    val errors = scala.collection.mutable.ArrayBuffer.empty[String]
    // Per-query run diagnostics (r13 flag: a 26 s driver reading on a
    // 3 s query was undiagnosable from the artifact): GC time spent
    // across the 3 reps, and the executor-storage footprint right
    // after the last rep BEFORE the hygiene sweep — eviction pressure
    // (high storage + high GC) is distinguishable from a code
    // regression (flat diagnostics, slow anyway) after the fact.
    def gcMs(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).filter(_ > 0).sum
    }
    val diags = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // min of 3 timed reps: one-off scheduler/GC hiccups don't pollute
    // the reported steady-state number (machine-load drift on shared
    // hosts has produced spurious 2x readings on sub-second queries)
    val results = names.map { name =>
      val gc0 = gcMs()
      val times = (1 to 3).flatMap { i =>
        val t0 = System.nanoTime()
        val r =
          try { SparkEntry.queries(name)(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
          catch {
            case e: Throwable =>
              System.err.println(s"[bench] $name: $e"); errors += name; None
          }
        if (i == 3) {
          val st = spark.sparkContext.getRDDStorageInfo
          diags(name) = s"""{"gc_ms": ${gcMs() - gc0}, """ +
            s""""cached_rdds": ${st.length}, """ +
            s""""storage_mem_mb": ${st.map(_.memSize).sum / 1048576}, """ +
            s""""storage_disk_mb": ${st.map(_.diskSize).sum / 1048576}}"""
        }
        clean() // outside the timed span: reps start from identical storage state
        r
      }
      name -> (if (times.nonEmpty) times.min else -1.0)
    }
    // times rounded to ms: enough resolution for any regression gate,
    // and it keeps the artifact stable/diffable. Totals are sums of
    // the ROUNDED per-query values, so the artifact's total always
    // equals the sum of its own entries.
    def msv(v: Double): Double =
      if (v < 0) -1.0 else math.round(v * 1000) / 1000.0
    def ms(v: Double): String = msv(v).toString
    val rounded = results.map { case (k, v) => k -> msv(v) }
    val qs = rounded.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = rounded.map(_._2).filter(_ >= 0).sum
    val errJson = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line =
      s"""{"metric":"total","value":${ms(total)},"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}"""
    println(line)
    // ALSO write the complete JSON to a repo-tracked file: the
    // driver's stdout tail-capture has truncated the per-query map
    // before (BENCH_r09.json "parsed": null) — the official artifact
    // must never depend on how much of a long line a log keeps.
    // Pretty-ish line-delimited: header, one "name": sec per line.
    // The path resolves against the repo root (nearest ancestor of the
    // cwd holding build.sbt, or SPARK_GRAFT_REPO), not the raw cwd —
    // the artifact is repo-tracked and must land in the repo.
    val latestSha: String = if (only.nonEmpty) "" else try {
      val perQ = rounded.map { case (k, v) => s"""    "$k": $v""" }
        .mkString(",\n")
      // "diagnostics" is a SEPARATE map (same keys) so the "queries"
      // values stay plain numbers — the driver's parser contract.
      val perD = diags.map { case (k, v) => s"""    "$k": $v""" }
        .mkString(",\n")
      val pretty =
        s"""{
           |  "metric": "total",
           |  "value": ${ms(total)},
           |  "unit": "sec",
           |  "sf": "$sfDir",
           |  "errors": $errJson,
           |  "queries": {
           |$perQ
           |  },
           |  "diagnostics": {
           |$perD
           |  }
           |}""".stripMargin
      val root = sys.env.get("SPARK_GRAFT_REPO")
        .map(java.nio.file.Paths.get(_))
        .getOrElse {
          var p = java.nio.file.Paths.get("").toAbsolutePath
          while (p.getParent != null &&
            !java.nio.file.Files.exists(p.resolve("build.sbt")))
            p = p.getParent
          p
        }
      val bytes = (pretty + "\n").getBytes("UTF-8")
      java.nio.file.Files.write(root.resolve("BENCH_LATEST.json"), bytes)
      java.security.MessageDigest.getInstance("SHA-256").digest(bytes)
        .map("%02x".format(_)).mkString
    } catch { case e: Throwable =>
      System.err.println(s"[bench] BENCH_LATEST.json write failed: $e"); ""
    }
    // LAST stdout line: a compact, full-schema summary the driver's
    // bounded tail capture can always parse (the full per-query line
    // above outgrows it at registry size — BENCH_r10.json parsed
    // null). "queries" here is only the r2-comparable subset (the 21
    // queries BASELINE.md's baseline subtotal is defined over); the
    // complete map lives in BENCH_LATEST.json, fingerprinted by
    // "bench_latest_sha256".
    val r2Set = SparkEntry.r2Comparable.toSet
    val sub = rounded.filter { case (k, v) => r2Set(k) && v >= 0 }
    val subQs = sub.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    println(
      s"""{"metric":"total","value":${ms(total)},"unit":"sec","sf":"$sfDir","queries":$subQs,"subtotal_r2_comparable":${ms(sub.map(_._2).sum)},"queries_timed":${rounded.count(_._2 >= 0)},"errors":$errJson,"bench_latest_sha256":"$latestSha"}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
