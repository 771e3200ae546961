package graft

import graft.queries.Regress

/** regress_multi contracts: coefficients equal a sequential
  * BigInt-exact Cramer solve, and the fit is economically sane on
  * the TPC-H-ish generator (price rises with quantity).
  */
class RegressSpec extends SparkSuite {

  test("regress_multi equals the sequential BigInt Cramer solve") {
    val rows = graft.core.Tables.lineitem(spark, sfDir)
      .selectExpr(
        "CAST(floor(l_quantity + 0.5) AS BIGINT)",
        "CAST(floor(l_discount * 10000 + 0.5) AS BIGINT)",
        "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").collect()
      .map(r => (BigInt(r.getLong(0)), BigInt(r.getLong(1)), BigInt(r.getLong(2))))
    val n = BigInt(rows.length)
    val s1 = rows.map(_._1).sum; val s2 = rows.map(_._2).sum
    val sy = rows.map(_._3).sum
    val s11 = rows.map(t => t._1 * t._1).sum
    val s12 = rows.map(t => t._1 * t._2).sum
    val s22 = rows.map(t => t._2 * t._2).sum
    val s1y = rows.map(t => t._1 * t._3).sum
    val s2y = rows.map(t => t._2 * t._3).sum
    val det = n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s12 - s11 * s2)
    val det0 = sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) +
      s2 * (s1y * s12 - s11 * s2y)
    val det1 = n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s2y - s1y * s2)
    val det2 = n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) +
      sy * (s1 * s12 - s11 * s2)
    def micro(num: BigInt): Long =
      math.floor(num.toDouble / det.toDouble * 1000000 + 0.5).toLong
    val got = Regress.regressMulti(spark, sfDir).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(0) == rows.length.toLong)
    assert(r.getLong(1) == micro(det0), "intercept")
    assert(r.getLong(2) == micro(det1), "quantity slope")
    assert(r.getLong(3) == micro(det2), "discount slope")
    // the system is well-posed (regressors not collinear in the data)
    assert(det != 0, "singular normal equations")
  }
}
