package graft

import graft.queries.Intervals

/** Interval-merge contracts: the windowed island computation equals
  * a sequential sweep-line merge, and the coverage report is
  * consistent with the islands (disjoint, ordered, exact spans).
  */
class IntervalsSpec extends SparkSuite {

  private def seqIslands(): Map[Long, Seq[(Long, Long, Long)]] = {
    val evs = graft.core.Tables.events(spark, sfDir)
      .selectExpr("user_id", "event_id", "ts DIV 1000 AS s", "value").collect()
      .map { r =>
        val s = r.getLong(2)
        val dur = math.max(math.floor(r.getDouble(3) * 1000 + 0.5).toLong, 1L) * 600000L
        (r.getLong(0), r.getLong(1), s, s + dur)
      }
    evs.groupBy(_._1).map { case (u, rows) =>
      val sorted = rows.sortBy(t => (t._3, t._4, t._2))
      val islands = collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      var (start, end, n) = (0L, 0L, 0L)
      sorted.foreach { case (_, _, s, e) =>
        if (n == 0L || s > end) {
          if (n > 0L) islands += ((start, end, n))
          start = s; end = e; n = 1L
        } else { end = math.max(end, e); n += 1L }
      }
      if (n > 0L) islands += ((start, end, n))
      u -> islands.toSeq
    }
  }

  test("interval_merge equals the sequential sweep-line merge") {
    val expect = seqIslands()
    val got = Intervals.intervalMerge(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .groupBy(_._1)
      .map { case (u, rows) =>
        u -> rows.sortBy(_._2).toSeq.map(t => (t._3, t._4, t._5))
      }
    assert(got.keySet == expect.keySet)
    expect.foreach { case (u, is) =>
      assert(got(u) == is, s"user $u islands differ")
    }
    // islands actually merge something on this data
    val nEvents = expect.values.map(_.map(_._3).sum).sum
    val nIslands = expect.values.map(_.size).sum
    assert(nIslands < nEvents, "expected at least one merged overlap")
  }

  test("join_interval_overlap equals the naive per-user all-pairs overlap join") {
    def side(et: String): Array[(Long, Long, Long, Long)] =
      graft.core.Tables.events(spark, sfDir)
        .filter(s"event_type = '$et'")
        .selectExpr("user_id", "event_id", "ts DIV 1000 AS s", "value").collect()
        .map { r =>
          val s = r.getLong(2)
          val dur = math.max(math.floor(r.getDouble(3) * 1000 + 0.5).toLong, 1L) * 60000L
          (r.getLong(0), r.getLong(1), s, s + dur)
        }
    val clicks = side("click"); val views = side("view")
    val expect = (for {
      (ua, ia, sa, ea) <- clicks
      (ub, ib, sb, eb) <- views
      if ua == ub && sa < eb && sb < ea
    } yield (ua, ia, ib) -> (math.min(ea, eb) - math.max(sa, sb))).toMap
    val gotRows = Intervals.joinIntervalOverlap(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
    // exactly-once: the bucket-attribution filter must not duplicate pairs
    assert(gotRows.length == gotRows.map(_._1).distinct.length, "duplicate pairs")
    assert(gotRows.toMap == expect)
    assert(expect.nonEmpty)
  }

  test("interval_coverage is consistent with the islands; islands are disjoint") {
    val expect = seqIslands()
    val cov = Intervals.intervalCoverage(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(cov.keySet == expect.keySet)
    expect.foreach { case (u, is) =>
      // disjoint + strictly ordered
      is.sliding(2).foreach {
        case Seq((_, e1, _), (s2, _, _)) => assert(e1 < s2, s"user $u islands overlap")
        case _ =>
      }
      val (ni, covered, maxSpan, maxN) = cov(u)
      assert(ni == is.size.toLong)
      assert(covered == is.map(t => t._2 - t._1).sum)
      assert(maxSpan == is.map(t => t._2 - t._1).max)
      assert(maxN == is.map(_._3).max)
    }
  }
}
