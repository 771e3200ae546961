package graft.core

import org.apache.spark.sql.DataFrame

/** Lineage truncation for iterative operators (connected components,
  * PageRank, k-means, BPE training, pipeline stage frames).
  *
  * Default is `localCheckpoint(eager = true)`: blocks live in executor
  * storage, no extra I/O — the right call in local mode and the fast
  * path on a healthy cluster. Its durability gap: losing an executor
  * destroys both the blocks AND the lineage needed to recompute them,
  * so a long iterative job dies mid-flight. The reference engine's
  * whole recovery story is surviving worker death (reference:
  * mr/master.go:111-127 reassigns tasks of lost workers); the Spark
  * equivalent for iterative state is a RELIABLE checkpoint. Setting
  * `spark.graft.checkpointDir` to a shared/replicated path (HDFS, S3,
  * NFS) switches every iterative operator to `checkpoint()` against
  * it — each round writes its frame out and recovery replays from
  * storage instead of dead executors' memory. Cost: one write per
  * truncation, the standard durability/throughput trade.
  */
object Checkpoints {

  /** Materialize `df` eagerly and cut its lineage, reliably when
    * `spark.graft.checkpointDir` is set, executor-locally otherwise.
    *
    * Retention: reliable checkpoint files are NOT deleted when the
    * frame is later unpersisted — they are the recovery state. Spark
    * reclaims them with the app when
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true` (a
    * startup conf); otherwise prune the checkpoint root externally.
    */
  def stable(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    // Lint-mode escape hatch (PlanLintSpec): a localCheckpoint cuts
    // lineage, so plan lints walking a returned frame cannot see
    // windows/joins UPSTREAM of a `.stable` — with this conf set the
    // cut is skipped and the full end-to-end plan stays visible.
    // NEVER set outside plan linting: operators rely on truncation
    // for bounded plan depth and once-only upstream execution.
    if (s.conf.get("spark.graft.stableOff", "false").toBoolean) return df
    s.conf.getOption("spark.graft.checkpointDir") match {
      case Some(dir) =>
        // setCheckpointDir appends a per-app unique subdir, so compare
        // against the configured ROOT: set on first use, and re-point
        // if the app (or a conf change) aimed the context elsewhere —
        // silently checkpointing to a stale dir would void the
        // durability contract this conf exists for
        if (!s.sparkContext.getCheckpointDir.exists(_.startsWith(dir)))
          s.sparkContext.setCheckpointDir(dir)
        // persist first: checkpoint(eager) otherwise runs the plan
        // TWICE (once for the eager action, once when the reliable
        // writer re-computes partitions to write files)
        val cached = df.persist()
        val out = cached.checkpoint()
        cached.unpersist(false)
        out
      case None => df.localCheckpoint(true)
    }
  }

  /** In-LOOP lineage truncation: like [[stable]], but ALWAYS a
    * reliable `checkpoint()` — when neither `spark.graft.checkpointDir`
    * nor `spark.graft.loopCheckpointDir` is set, a per-application
    * tmp-dir default is used rather than falling back to
    * localCheckpoint.
    *
    * Why loops are different: a localCheckpoint block is the ONLY
    * copy of its frame (lineage truncated, no recompute path). A
    * one-shot `.stable` cut holds such blocks for one query — cheap
    * and acceptable. An iterative operator holds them across EVERY
    * remaining round, so late-run eviction pressure lands exactly on
    * the longest-lived state: the r11 dedup_cluster_minhash and r13
    * graph-family bench incidents (26 s driver readings on 3 s
    * queries, same binary). Checkpoint FILES are eviction-immune and
    * recompute-safe, and the frames at loop truncation points are
    * round-state (node/label/rank tables), orders of magnitude
    * smaller than the corpus — the write is the cheap side of the
    * trade. On a cluster, point the conf at shared storage and the
    * same call sites survive executor death (mr/master.go:111-127's
    * recovery contract, reference).
    *
    * Local tmp default: still strictly better than localCheckpoint in
    * local mode (same machine, but files instead of block-manager
    * memory — no competition with execution memory, no eviction).
    * File retention follows [[stable]]'s note
    * (`spark.cleaner.referenceTracking.cleanCheckpoints` — Bench and
    * Verify set it).
    */
  def stableLoop(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    // Deliberately NO stableOff escape hatch here (unlike [[stable]]):
    // a loop cut hides only prior ITERATIONS of the same loop body —
    // the operators the plan lints look for appear in full in the
    // first iteration — while removing it grows the plan 2-4× per
    // round (the hits loop's first stride-4 cut OOM'd the driver just
    // stringifying the plan) and turns per-round driver collects into
    // full-chain recomputes. The end-to-end lint walk stays sound AND
    // terminates.
    val dir = s.conf.getOption("spark.graft.loopCheckpointDir")
      .orElse(s.conf.getOption("spark.graft.checkpointDir"))
      .getOrElse(s"${System.getProperty("java.io.tmpdir")}/graft_ckpt_" +
        s.sparkContext.applicationId)
    if (!s.sparkContext.getCheckpointDir.exists(_.startsWith(dir)))
      s.sparkContext.setCheckpointDir(dir)
    val cached = df.persist()
    val out = cached.checkpoint()
    cached.unpersist(false)
    out
  }

  /** Free the storage behind a frame produced by [[stable]] (or a
    * plain `.persist()`). `Dataset.unpersist` only clears CacheManager
    * entries, which localCheckpoint bypasses — its blocks hang off the
    * internal RDD inside the plan's `LogicalRDD` leaf, so we walk the
    * analyzed plan and unpersist every such RDD directly. Reliable
    * checkpoint FILES are deliberately left alone (they are the
    * recovery state — see [[stable]]'s retention note); unpersisting
    * a non-persisted RDD is a no-op, so this is safe to call on any
    * frame. Best-effort: a stopped SparkContext makes block removal
    * moot (executor storage died with it), so errors are swallowed.
    */
  def release(df: DataFrame): Unit =
    try {
      df.unpersist(false)
      df.queryExecution.analyzed.foreach {
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          lr.rdd.unpersist(false)
        case _ => ()
      }
    } catch { case _: Throwable => () }

  /** `.stable` chain form of [[stable]] / [[stableLoop]]. */
  implicit class StableOps(private val df: DataFrame) extends AnyVal {
    def stable: DataFrame = Checkpoints.stable(df)
    def stableLoop: DataFrame = Checkpoints.stableLoop(df)
  }
}
