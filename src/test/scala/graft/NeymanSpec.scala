package graft

import graft.queries.Neyman

/** sample_neyman contracts: equals a sequential BigInt replay, the
  * allocation sums to the budget EXACTLY, and allocation order
  * follows the Neyman weights N_h·S_h.
  */
class NeymanSpec extends SparkSuite {

  test("sample_neyman equals the sequential Hamilton apportionment") {
    val rows = graft.core.Tables.events(spark, sfDir)
      .selectExpr("event_type", "CAST(floor(value * 100 + 0.5) AS BIGINT)")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val stats = rows.groupBy(_._1).map { case (et, rs) =>
      val n = BigInt(rs.length)
      val s1 = rs.map(t => BigInt(t._2)).sum
      val s2 = rs.map(t => BigInt(t._2) * t._2).sum
      val sd = math.floor(math.sqrt((n * s2 - s1 * s1).toDouble
        / (n * (n - 1)).toDouble) * 1000000 + 0.5).toLong
      et -> (rs.length.toLong, sd, rs.length.toLong * sd)
    }
    val tw = stats.values.map(_._3).sum
    val base = stats.map { case (et, (n, sd, w)) =>
      et -> (n, sd, Neyman.Budget * w / tw, Neyman.Budget * w % tw)
    }
    val short = Neyman.Budget - base.values.map(_._3).sum
    val order = base.toSeq.sortBy { case (et, (_, _, _, rem)) => (-rem, et) }
    val expect = order.zipWithIndex.map { case ((et, (n, sd, b, _)), i) =>
      et -> (n, sd, b + (if (i < short) 1L else 0L))
    }.toMap
    val got = Neyman.sampleNeyman(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == expect)
    assert(got.values.map(_._3).sum == Neyman.Budget, "allocation must sum exactly")
    // monotone in the Neyman weight
    val byW = stats.toSeq.sortBy(_._2._3).map(_._1)
    val byAlloc = got.toSeq.sortBy(t => (t._2._3, t._1)).map(_._1)
    byW.zip(byAlloc).foreach { case (a, b) =>
      assert(got(a)._3 <= got(b)._3 + 1, "allocation should track N·S ordering")
    }
  }
}
