package graft.core

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The reference engine's sole data type: a string key-value pair
  * (reference: mr/worker.go:19-22). A dataset in the reference is
  * `[]KeyValue` held in one worker's RAM; here it is a distributed,
  * spillable `Dataset[KV]` — strictly more general.
  */
final case class KV(key: String, value: String)

/** Spark-native re-expression of the reference's MapReduce programming
  * model (reference: mr/worker.go, mr/master.go). The reference's whole
  * control plane — task queue, phase barrier, straggler re-execution,
  * atomic output commit (master.go:111-127, 171-223; worker.go:141-157) —
  * is supplied by Spark's DAG scheduler, shuffle, task retry, speculation
  * and FileOutputCommitter; none of it is re-implemented here.
  *
  * Semantics preserved exactly (reference: worker.go:45, 78-98):
  *   - `mapf(key, value)` is called once per input record (for file
  *     inputs: key = file path, value = entire contents) and may emit
  *     0..n pairs.
  *   - `reducef(key, values)` is called once per distinct key with ALL
  *     values for that key; value order is explicitly UNSPECIFIED, as in
  *     the reference (map-task concatenation order) — deterministic apps
  *     must sort values themselves (reference: mrapps/indexer.go:37,
  *     mrapps/crash.go:48-52).
  *   - `nReduce` controls only output partitioning, never grouping
  *     results (reference: mrmaster.go:23).
  *
  * Scale notes: `run` (arbitrary reducef) cannot partially aggregate —
  * exactly like the reference, which has no combiners (worker.go:78-94).
  * For associative reducers use [[runAssociative]], which Spark executes
  * with map-side partial aggregation (an upgrade the MR paper calls a
  * combiner); at 100 TB this is the difference between shuffling every
  * pair and shuffling one pre-merged value per (partition, key).
  */
object MapReduceJob {

  /** Generic form: mirrors worker.go:66-100 (sort → group adjacent →
    * reduce once per key). The groupByKey shuffle hash-partitions by key
    * (reference ihash%R, worker.go:28-32 — different hash function,
    * identical grouping semantics).
    */
  def run(
      records: Dataset[KV],
      mapf: (String, String) => IterableOnce[KV],
      reducef: (String, Seq[String]) => String,
      nReduce: Int = 10,
      speculation: Boolean = false): Dataset[KV] = {
    val spark = records.sparkSession
    if (speculation) requireSpeculation(spark)
    import spark.implicits._
    records
      .flatMap(r => mapf(r.key, r.value))
      .groupByKey(_.key)
      .mapGroups((k, it) => KV(k, reducef(k, it.map(_.value).toSeq)))
      .repartition(nReduce)
  }

  /** Combiner-enabled form for associative+commutative reducers.
    * `reduceGroups` runs as a typed Aggregator with partial (map-side)
    * merge — the scalable path the reference lacks.
    */
  def runAssociative(
      records: Dataset[KV],
      mapf: (String, String) => IterableOnce[KV],
      merge: (String, String) => String,
      nReduce: Int = 10,
      speculation: Boolean = false): Dataset[KV] = {
    val spark = records.sparkSession
    if (speculation) requireSpeculation(spark)
    import spark.implicits._
    records
      .flatMap(r => mapf(r.key, r.value))
      .groupByKey(_.key)
      .reduceGroups((a, b) => KV(a.key, merge(a.value, b.value)))
      .map(_._2)
      .repartition(nReduce)
  }

  /** Run a ServiceLoader-discovered plugin by name — the reference's
    * `mrworker wc.so pg-*.txt` entry point (mrworker.go:22-51): app
    * resolved at run time, no compile-time linkage. See
    * [[MapReducePlugin]] for the `--jars` registration contract.
    */
  def runPlugin(
      records: Dataset[KV],
      pluginName: String,
      nReduce: Int = 10,
      speculation: Boolean = false): Dataset[KV] = {
    val p = MapReducePlugin.load(pluginName)
    run(records, p.mapf, p.reducef, nReduce, speculation)
  }

  /** Whole-file input records, as the reference reads them
    * (worker.go:102-109: one record per file, key = path, value = full
    * contents). At 100 TB one-record-per-file only scales if files are
    * bounded (the paper's 16-64 MB splits); for row-shaped data prefer
    * the relational queries in graft.queries.
    */
  def fileRecords(spark: SparkSession, paths: Seq[String]): Dataset[KV] = {
    import spark.implicits._
    spark.sparkContext
      .wholeTextFiles(paths.mkString(","))
      .toDF("key", "value")
      .as[KV]
  }

  /** Text sink parity: lines "key value", `nReduce` output files
    * (reference: worker.go:92-97). Atomic commit is Spark's
    * FileOutputCommitter (≡ the reference's temp-file + os.Rename).
    * `byKey = true` hash-places rows by key like the reference's
    * ihash%R (worker.go:113-117); the round-robin default differs
    * only in file placement — unobservable under the sorted-cat
    * comparison (test-mr.sh:59-60) and better balanced under skew,
    * so the deviation is a documented choice, not an accident.
    */
  def writeTextOutput(ds: Dataset[KV], dir: String, nReduce: Int = 10,
      byKey: Boolean = false): Unit = {
    val parted = if (byKey) ds.repartition(nReduce, col("key")) else ds.repartition(nReduce)
    parted
      .select(concat_ws(" ", col("key"), col("value")))
      .write.mode("overwrite").text(dir)
  }

  /** F11 backup-task parity (reference: master.go:111-127 re-queues
    * in-progress tasks after a 10 s timeout): Spark's speculative
    * execution re-launches straggler task attempts; the commit
    * coordinator accepts exactly one attempt's output, like the
    * reference's atomic rename. `spark.speculation` is a SCHEDULER
    * conf, read once at context start and ignored in local mode, so
    * there is no true per-job toggle — the façade knob instead
    * asserts the caller's context was built with it on (Bench/Verify
    * and the test harness set it; local mode accepts-and-ignores it).
    */
  private def requireSpeculation(spark: SparkSession): Unit =
    require(
      spark.sparkContext.getConf.getBoolean("spark.speculation", defaultValue = false),
      "speculation=true needs a context built with spark.speculation=true " +
        "(scheduler conf, fixed at context start — Spark has no per-job toggle)")
}
