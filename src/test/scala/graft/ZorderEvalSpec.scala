package graft

import graft.queries.Sharding

/** zorder_eval contracts: pruning is SAFE (scanned rows cover every
  * probe-matching row), the layouts trade exactly as theory says
  * (linear wins its leading dimension, z-order wins the off-sort
  * dimension), and file counts are intact.
  */
class ZorderEvalSpec extends SparkSuite {

  test("zorder_eval: safe pruning + the expected layout trade-off") {
    val rows = graft.core.Tables.orders(spark, sfDir)
      .selectExpr("o_custkey",
        "datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01')").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong))
    val probes = Map(
      "x_range" -> ((x: Long, y: Long) => x >= 0 && x <= 150),
      "y_range" -> ((x: Long, y: Long) => y >= 9131 && y <= 9371),
      "both" -> ((x: Long, y: Long) => x >= 0 && x <= 150 && y >= 9131 && y <= 9371))
    val got = Sharding.zorderEval(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.size == 6)
    got.foreach { case ((layout, probe), (nf, hit, scanned)) =>
      assert(nf == Sharding.EvalFiles.toLong, s"$layout/$probe file count")
      assert(hit <= nf && scanned <= rows.length.toLong)
      // SAFETY: min/max pruning may over-scan, never under-scan
      val matching = rows.count(t => probes(probe)(t._1, t._2)).toLong
      assert(scanned >= matching, s"$layout/$probe unsafe prune")
    }
    // off-sort-dimension probe: z-order must beat the linear layout
    assert(got(("zorder", "y_range"))._2 < got(("linear_xy", "y_range"))._2,
      "z-order should prune y-probes the linear layout cannot")
    // leading-dimension probe: the dedicated sort is at least as good
    assert(got(("linear_xy", "x_range"))._2 <= got(("zorder", "x_range"))._2)
  }
}
