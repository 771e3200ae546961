package graft

import org.apache.spark.sql.functions._

/** DSv2 text sink: mr-out-<r> naming, "key value" line format, and
  * partition-count control — the reference's F9 sink contract
  * (worker.go:92-97) driven through Spark's commit protocol.
  */
class KvTextSinkSpec extends SparkSuite {
  import spark.implicits._

  test("writes one mr-out-<r> file per partition with 'key value' lines") {
    val dir = s"/tmp/graft_kvsink_${System.nanoTime()}"
    val counts = Seq(("apple", "3"), ("pear", "2"), ("plum", "7"), ("fig", "1"))
      .toDF("key", "value")
    counts.repartition(3, col("key"))
      .write.format("graft.sources.KvTextSink").mode("append").save(dir)
    val files = new java.io.File(dir).listFiles().map(_.getName).sorted
    assert(files.toSeq === Seq("mr-out-0", "mr-out-1", "mr-out-2"))
    // sort(cat mr-out*) ≡ expected — exactly test-mr.sh:59's check
    val lines = files.flatMap(f =>
      scala.io.Source.fromFile(s"$dir/$f").getLines()).sorted
    assert(lines.toSeq === Seq("apple 3", "fig 1", "pear 2", "plum 7"))
    // no temp litter after job commit
    assert(!new java.io.File(dir).listFiles().exists(_.getName.startsWith("_tmp")))
  }

  test("rejects non-(key,value) schemas at write planning") {
    // Spark's analyzer enforces the declared 2-column table schema
    // before the sink's own require() is even reached
    val dir = s"/tmp/graft_kvsink_bad_${System.nanoTime()}"
    val e = intercept[Exception] {
      Seq((1, "a", "b")).toDF("x", "y", "z")
        .write.format("graft.sources.KvTextSink").mode("append").save(dir)
    }
    assert(e.getMessage.contains("INSERT_COLUMN_ARITY_MISMATCH")
      || e.getMessage.contains("exactly (key, value)"))
  }
}
