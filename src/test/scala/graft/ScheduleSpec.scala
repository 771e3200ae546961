package graft

import org.apache.spark.sql.functions._
import graft.queries.{Corpus, Curation, EventOps}

/** Invariants of the round-7 schedule/mixing additions that the DuckDB
  * hash gate can't state directly: EWMA convexity, curriculum ordering
  * laws, and temperature-mix mass conservation.
  */
class ScheduleSpec extends SparkSuite {

  test("events_ewma is a convex smoother: head equals the raw count, tail within the trailing-window range") {
    val rows = EventOps.eventsEwma(spark, sfDir)
      .orderBy("event_type", "hour").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_._1)
    byType.values.foreach { series =>
      // first observation: no history, renormalized EWMA = c itself
      val (_, _, c0, e0) = series.head
      assert(e0 === c0.toDouble, s"series head must equal its count: $c0 vs $e0")
      // every EWMA lies within the min/max of its trailing window
      series.indices.foreach { i =>
        val window = series.slice(math.max(0, i - EventOps.EwmaWindow + 1), i + 1)
        val cs = window.map(_._3.toDouble)
        val e = series(i)._4
        assert(e >= cs.min - 1e-4 && e <= cs.max + 1e-4,
          s"ewma $e outside [${cs.min}, ${cs.max}] at index $i")
      }
    }
  }

  test("curriculum_order: positions are a contiguous per-shard bijection and phases are non-decreasing along each shard's order") {
    val rows = Curation.curriculumOrder(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    val byShard = rows.groupBy(_._3)
    assert(byShard.keySet.subsetOf((0 until Curation.NShards).toSet))
    byShard.values.foreach { shard =>
      val poss = shard.map(_._4).sorted.toSeq
      assert(poss === (1 to shard.size), "positions must be 1..n per shard")
      // training order streams phases monotonically (cleanest first)
      val phasesInOrder = shard.sortBy(_._4).map(_._2)
      assert(phasesInOrder.zip(phasesInOrder.tail).forall { case (a, b) => a <= b },
        s"phase order regressed within a shard: $phasesInOrder")
    }
    // doc ids are globally unique (each doc scheduled exactly once)
    assert(rows.map(_._1).distinct.length === rows.length)
  }

  test("mix_temperature conserves probability mass and compresses the mix toward uniform") {
    val rows = Corpus.mixTemperature(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    val pSum = rows.map(_._2).sum
    val qSum = rows.map(_._3).sum
    assert(math.abs(pSum - 1.0) < 1e-2 && math.abs(qSum - 1.0) < 1e-2,
      s"shares must each sum to ~1: p=$pSum q=$qSum")
    // temperature scaling boosts below-average sources, damps above-average
    val mean = rows.map(_._2).sum / rows.size
    rows.foreach { case (src, p, q, boost) =>
      if (p < mean * 0.9) assert(boost >= 1.0, s"small source $src not boosted: $boost")
      if (p > mean * 1.1) assert(boost <= 1.0, s"large source $src not damped: $boost")
      assert(math.abs(q - p * boost) < 1e-3, s"boost inconsistent for $src")
    }
  }
}
