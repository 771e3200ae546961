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
    * with isAdjustedToUTC=false (read as TIMESTAMP_NTZ). The NTZ
    * wall-clock is defined as UTC by the testdata contract
    * (TESTDATA.md), and the conversion below is PURE wall-clock
    * arithmetic — epoch days + time-of-day, every term
    * timezone-independent on NTZ — so the epoch output is identical
    * under ANY spark.sql.session.timeZone (a plain
    * `cast(ntz as timestamp)` would shift by the session offset).
    * Derive µs timestamps with `expr("ts DIV 1000")` where
    * wall-clock semantics are needed — never `/` (double loses bits
    * above 2^53).
    */
  /** STRUCTURAL probe for the TIMESTAMP(NANOS) testdata generation:
    * read the parquet footer's logical type for `ts` directly instead
    * of try-catch-and-match-the-exception-text (error messages aren't
    * a stable API across Spark versions, and retry-on-message can mask
    * unrelated failures that merely mention NANOS).
    */
  private def tsIsNanos(s: SparkSession, path: String): Boolean = {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import scala.jdk.CollectionConverters._
    val conf = s.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return false
    val st = fs.getFileStatus(p)
    val file =
      if (st.isFile) Some(p)
      else fs.listStatus(p).map(_.getPath).find(_.getName.endsWith(".parquet"))
    file.exists { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try {
        reader.getFooter.getFileMetaData.getSchema.getFields.asScala.exists {
          fld => fld.getName == "ts" && (fld.getLogicalTypeAnnotation match {
            case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
              t.getUnit == LogicalTypeAnnotation.TimeUnit.NANOS
            case _ => false
          })
        }
      } finally reader.close()
    }
  }

  def events(s: SparkSession, d: String): DataFrame = {
    // The legacy nanos flag is only set when the footer actually says
    // TIMESTAMP(NANOS) (Spark's vectorized reader rejects nanos
    // without it); it must then STAY set — executor-side schema
    // conversion re-reads it at action time — so the session-wide
    // effect is taken only on that generation, never on the
    // micros/NTZ path.
    if (tsIsNanos(s, s"$d/events.parquet")) {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    val df = t(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => df
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", expr(
          """(datediff(cast(ts as date), date'1970-01-01') * 86400000000L
            | + hour(ts) * 3600000000L + minute(ts) * 60000000L
            | + cast(date_part('SECOND', ts) * 1000000 as bigint)) * 1000L"""
            .stripMargin))
      case _ => df.withColumn("ts",
        expr("unix_micros(cast(ts as timestamp)) * 1000L"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
