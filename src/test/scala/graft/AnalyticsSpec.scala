package graft

import graft.queries.{EventOps, Relational}

/** mv_merge and pattern_match contracts: merge ≡ recompute inside
  * Spark, and a sequential pattern-scan reference.
  */
class AnalyticsSpec extends SparkSuite {

  test("mv_merge equals the single-pass recompute") {
    import org.apache.spark.sql.functions._
    val merged = Relational.mvMerge(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val full = graft.core.Tables.orders(spark, sfDir)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        round(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")) / 100.0, 2)
          .as("t"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(merged === full)
  }

  test("pattern_match ≡ sequential adjacency scan") {
    val ev = graft.core.Tables.events(spark, sfDir)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val bound = 48L * 3600L * 1000000000L
    val expected = ev.groupBy(_._1).values.flatMap { g =>
      val s = g.sortBy(e => (e._2, e._3)).toSeq
      s.sliding(3).collect {
        case Seq(v, c, p)
          if v._4 == "view" && c._4 == "click" && p._4 == "purchase" &&
            p._2 - v._2 <= bound =>
          (v._1, v._3, c._3, p._3, (p._2 - v._2) / 1000000000L)
      }
    }.toSet
    val got = EventOps.patternMatch(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }
}
