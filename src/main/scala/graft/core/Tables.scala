package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Parquet table loader for the driver's testdata layout
  * (/root/repo/TESTDATA.md). Scans are plain `spark.read.parquet` so
  * Catalyst's predicate pushdown + column pruning reach the parquet
  * reader (check `.explain`: PushedFilters / ReadSchema).
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = t(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = t(s, d, "region")
  /** events.ts is normalized to epoch-nanos BIGINT whatever the
    * parquet physical type, so every downstream operator computes on
    * one integer timeline. Generations of the testdata have shipped
    * both TIMESTAMP(NANOS) (read as long via nanosAsLong — Spark's
    * vectorized reader rejects nanos otherwise) and TIMESTAMP(MICROS)
    * (read as a real timestamp, converted here via unix_micros ×
    * 1000 — exact: sessions run UTC and µs×1000 stays < 2^63 until
    * 2262). Derive µs timestamps with `expr("ts DIV 1000")` where
    * wall-clock semantics are needed — never `/` (double loses bits
    * above 2^53).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = t(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => df
      case _ => df.withColumn("ts",
        expr("unix_micros(cast(ts as timestamp)) * 1000L"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
