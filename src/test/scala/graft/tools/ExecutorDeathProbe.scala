package graft.tools

import org.apache.spark.TaskContext
import org.apache.spark.sql.SparkSession
import graft.core.{KV, MapReduceJob}

/** A6/F11 PROCESS-level fault probe (forked by MapReduceJobSpec): the
  * reference's crash.go kills the worker PROCESS (`os.Exit(1)`,
  * mrapps/crash.go:20-32) and master.go re-queues the task on a live
  * worker. In-JVM `local[*]` can only emulate that as a task-attempt
  * failure, so this probe runs a REAL multi-process cluster —
  * `local-cluster[2,1,1024]` (standalone master + 2 workers in the
  * driver JVM, each EXECUTOR a separate OS process) — and SIGKILLs one
  * executor JVM mid-map (`Runtime.halt`, the JVM analog of os.Exit
  * with no shutdown hooks). Spark must observe the executor loss,
  * re-run the lost tasks (and any lost shuffle output) on the
  * surviving/relaunched executor, and complete with output identical
  * to the sequential model.
  *
  * The halt is claimed through an atomic marker-file create on the
  * (host-shared) local FS so exactly ONE attempt dies regardless of
  * stage resubmission — a TaskContext.attemptNumber gate would halt
  * again on a stage RE-submission, whose task attempts restart at 0.
  *
  * Exit 0 + `[executor-death] ok` on stdout iff the job completed
  * with correct results AND the kill really happened.
  */
object ExecutorDeathProbe {
  def main(args: Array[String]): Unit = {
    val marker = java.nio.file.Files
      .createTempDirectory("graft-exec-death").resolve("killed").toString
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar")
      .map(p => s"--add-opens $p=ALL-UNNAMED").mkString(" ")
    val spark = SparkSession.builder()
      .master("local-cluster[2,1,1024]")
      .appName("graft-executor-death")
      // executors are fresh JVMs: they need the test classpath (this
      // JVM's) and the same JDK-17 module opens the driver runs with
      .config("spark.executor.extraClassPath",
        System.getProperty("java.class.path"))
      .config("spark.executor.extraJavaOptions", addOpens)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.task.maxFailures", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val docs = (1 to 16).map(i => KV(f"d$i%02d",
        (1 to 12).map(j => s"w${(i * 7 + j) % 5}").mkString(" ")))
      val naive = docs
        .flatMap(r => r.value.split(" ").toSeq.map(w => (w, 1)))
        .groupBy(_._1).map { case (k, vs) => k -> vs.size.toString }
      val mapf: (String, String) => Seq[KV] = (doc, text) => {
        if (doc == "d01" && new java.io.File(marker).createNewFile())
          Runtime.getRuntime.halt(137) // SIGKILL-equivalent: no hooks
        text.split(" ").toSeq.filter(_.nonEmpty).map(w => KV(w, "1"))
      }
      val reducef: (String, Seq[String]) => String = (_, vs) => vs.size.toString
      import spark.implicits._
      val got = MapReduceJob.run(spark.createDataset(docs), mapf, reducef)
        .collect().map(kv => kv.key -> kv.value).toMap
      val killed = new java.io.File(marker).exists()
      require(killed, "the executor kill never fired — probe proved nothing")
      require(got == naive, s"wrong output after executor death: $got vs $naive")
      println(s"[executor-death] ok rows=${got.size} killed=$killed")
    } finally spark.stop()
  }
}
