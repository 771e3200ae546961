package graft

import graft.core.Tables

/** Loader contract: events.ts epoch-nanos normalization must not
  * depend on spark.sql.session.timeZone — the parquet column is
  * TIMESTAMP_NTZ (isAdjustedToUTC=false) whose wall clock is defined
  * as UTC by TESTDATA.md, and Tables.events converts it with pure
  * wall-clock arithmetic.
  */
class TablesSpec extends SparkSuite {

  test("events ts epoch identical under UTC and America/New_York sessions") {
    val tzKey = "spark.sql.session.timeZone"
    val prev = spark.conf.get(tzKey)
    val utc = Tables.events(spark, sfDir)
      .select("ts").orderBy("ts").limit(50).collect().map(_.getLong(0)).toSeq
    assert(utc.nonEmpty)
    try {
      spark.conf.set(tzKey, "America/New_York")
      val ny = Tables.events(spark, sfDir)
        .select("ts").orderBy("ts").limit(50).collect().map(_.getLong(0)).toSeq
      assert(ny === utc, "session timezone leaked into the epoch conversion")
    } finally spark.conf.set(tzKey, prev)
    // sanity: values are epoch NANOS (≥ 2000-01-01, < 2100-01-01)
    assert(utc.head > 946684800L * 1000000000L)
    assert(utc.head < 4102444800L * 1000000000L)
  }
}
