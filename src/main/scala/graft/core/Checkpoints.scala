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
    */
  def stable(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    s.conf.getOption("spark.graft.checkpointDir") match {
      case Some(dir) =>
        // setCheckpointDir appends a per-app unique subdir; set it once
        // per context and reuse (re-setting mid-app would scatter files)
        if (s.sparkContext.getCheckpointDir.isEmpty)
          s.sparkContext.setCheckpointDir(dir)
        df.checkpoint()
      case None => df.localCheckpoint(true)
    }
  }

  /** `.stable` chain form of [[stable]]. */
  implicit class StableOps(private val df: DataFrame) extends AnyVal {
    def stable: DataFrame = Checkpoints.stable(df)
  }
}
