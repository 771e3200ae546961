package graft

import org.apache.spark.sql.functions._

/** DSv2 whole-file source: F1-scan parity (filename + full contents,
  * one partition per file) and pruned metadata-only reads.
  */
class WholeFileSourceSpec extends SparkSuite {

  private lazy val dir = {
    val d = new java.io.File("/tmp/graft_wholefile")
    d.mkdirs()
    Map("a.txt" -> "alpha beta beta", "b.txt" -> "gamma", "c.txt" -> "x y z")
      .foreach { case (n, body) =>
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$d/$n"), body.getBytes("UTF-8"))
      }
    java.nio.file.Files.write( // hidden/underscore files are skipped
      java.nio.file.Paths.get(s"$d/_SUCCESS"), Array.empty[Byte])
    d.toString
  }

  private def read = spark.read.format("graft.sources.WholeFileSource").load(dir)

  test("one record per file with full contents; one partition per file") {
    val rows = read.collect().map(r =>
      r.getString(0).split("/").last -> r.getString(2)).toMap
    assert(rows === Map("a.txt" -> "alpha beta beta", "b.txt" -> "gamma", "c.txt" -> "x y z"))
    assert(read.rdd.getNumPartitions === 3) // ≡ one map task per file
  }

  test("column pruning reaches the reader: metadata query reads no bytes") {
    val df = read.select("path", "length")
    val scanLine = df.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("BatchScan")).getOrElse("")
    assert(!scanLine.contains("content"), s"content must be pruned: $scanLine")
    assert(df.collect().map(_.getLong(1)).sorted.toSeq === Seq(5L, 5L, 15L))
  }

  test("wc over the DSv2 source equals the reference tokenizer pipeline") {
    val words = read
      .select(explode(graft.queries.Dedup.tokensCol(col("content"))).as("w"))
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(words === Map("alpha" -> 1L, "beta" -> 2L, "gamma" -> 1L,
      "x" -> 1L, "y" -> 1L, "z" -> 1L))
  }
}
