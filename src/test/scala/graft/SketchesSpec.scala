package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.queries.Sketches

/** Sketch accuracy against exact answers: HLL estimates must land
  * within the configured error bounds, and the two-level union-merge
  * must agree with a single-level sketch over the same data.
  */
class SketchesSpec extends SparkSuite {

  private lazy val exactUsers: Map[String, Long] =
    Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("u"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap

  test("approx_count_distinct within 3×rsd of exact") {
    val rows = Sketches.approxDistinct(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSet === exactUsers.keySet)
    rows.foreach { r =>
      val exact = exactUsers(r.getString(0)).toDouble
      val est = r.getLong(2).toDouble
      assert(math.abs(est - exact) <= math.max(1.0, 3 * 0.02 * exact),
        s"${r.getString(0)}: est=$est exact=$exact")
    }
  }

  test("approx percentiles bracketed by column min/max") {
    val mm = Tables.events(spark, sfDir)
      .agg(min("value"), max("value")).collect()(0)
    val (lo, hi) = (mm.getDouble(0), mm.getDouble(1))
    Sketches.approxDistinct(spark, sfDir).collect().foreach { r =>
      val p50 = r.getDouble(3); val p99 = r.getDouble(4)
      assert(p50 >= lo && p50 <= hi)
      assert(p99 >= lo && p99 <= hi)
      assert(p50 <= p99)
    }
  }

  test("two-level HLL merge within 5% of exact distinct users") {
    Sketches.hllMerge(spark, sfDir).collect().foreach { r =>
      val exact = exactUsers(r.getString(0)).toDouble
      val est = r.getLong(2).toDouble
      assert(math.abs(est - exact) <= math.max(1.0, 0.05 * exact),
        s"${r.getString(0)}: merged est=$est exact=$exact")
    }
  }

  test("hll_union_agg(per-day sketches) == single sketch over all rows") {
    val ev = Tables.events(spark, sfDir)
    val single = ev.groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12))).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val merged = Sketches.hllMerge(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(merged === single)
  }

  test("heavy_hitters two-pass ≡ naive groupBy-HAVING (exactness despite local prefilter)") {
    val naive = Tables.documents(spark, sfDir)
      .select(explode(graft.queries.Dedup.tokensCol(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .filter(col("n") >= Sketches.HeavyHitterThreshold)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val got = Sketches.heavyHitters(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === naive && got.nonEmpty)
  }

  test("heavy_hitters pigeonhole prefilter is superset-safe on a skewed planted corpus") {
    import spark.implicits._
    // one token exactly at the threshold, spread across many partitions
    // so every local count is far below T — the prefilter must still
    // keep it (local bound is T/P, not T)
    val t = Sketches.HeavyHitterThreshold.toInt
    val rows = (0 until t).map(i => (i.toLong, "needle")) ++
      (0 until 100).map(i => ((t + i).toLong, "hay unique" + i))
    val df = rows.toDF("doc_id", "text").repartition(16)
    val out = Sketches.heavyHittersOn(df).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out === Map("needle" -> t.toLong))
    // input wider than T/MinLocalFloor partitions: the candidate stage
    // must coalesce rather than let minLocal floor to 1 (which would
    // pass the whole vocabulary into the broadcast) — and stay exact
    val wide = rows.toDF("doc_id", "text").repartition(600)
    val outWide = Sketches.heavyHittersOn(wide).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(outWide === Map("needle" -> t.toLong))
  }
}
