package graft

import graft.queries.Advanced

/** Skyline contract: exact equivalence with the quadratic dominance
  * definition the window formulation replaces.
  */
class SkylineSpec extends SparkSuite {

  test("skyline_2d ≡ brute-force Pareto dominance") {
    val parts = graft.core.Tables.part(spark, sfDir)
      .select("p_partkey", "p_retailprice", "p_size").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    def dominated(p: (Long, Double, Int)): Boolean = parts.exists { q =>
      q._2 <= p._2 && q._3 >= p._3 && (q._2 < p._2 || q._3 > p._3)
    }
    val expected = parts.filterNot(dominated).map(_._1).toSet
    val got = Advanced.skyline2d(spark, sfDir).collect()
      .map(_.getLong(0)).toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("skyline members are mutually non-dominating") {
    val sky = Advanced.skyline2d(spark, sfDir).collect()
      .map(r => (r.getDouble(1), r.getInt(2)))
    sky.foreach { p =>
      sky.foreach { q =>
        if (p != q)
          assert(!(q._1 <= p._1 && q._2 >= p._2 && (q._1 < p._1 || q._2 > p._2)),
            s"$q dominates $p inside the skyline")
      }
    }
  }
}
