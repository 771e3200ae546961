package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** df.observe(): pipeline telemetry (row counts, quality tallies)
  * accumulated DURING the job — no second scan, no extra action. At
  * 100 TB a separate count() for monitoring doubles the read; observe
  * rides the existing pass.
  */
class ObserveSpec extends SparkSuite {

  test("observation metrics ride the main action without a second scan") {
    val obs = Observation("ingest")
    val docs = graft.core.Tables.documents(spark, sfDir)
      .observe(obs,
        count(lit(1)).as("rows_in"),
        sum(when(col("n_chars") > 500, 1).otherwise(0)).as("n_long"),
        max("n_chars").as("max_chars"))
      .filter(col("n_chars") > 500)
    val kept = docs.count()
    val m = obs.get
    assert(m("rows_in") === 500L)           // observed BEFORE the filter
    assert(m("n_long") === kept)            // filter tally matches output
    assert(m("max_chars").asInstanceOf[Long] > 500L)
  }
}
