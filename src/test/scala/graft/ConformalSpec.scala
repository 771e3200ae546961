package graft

import graft.queries.Conformal
import org.apache.spark.sql.functions._

/** Conformal contracts: the fit, order statistic, and coverage equal
  * a sequential replication, and empirical coverage on the held-out
  * split is near the 90% target (the distribution-free guarantee).
  * Cross-engine hashes live under the DuckDB gate.
  */
class ConformalSpec extends SparkSuite {

  test("conformal_interval equals sequential split-conformal") {
    val pts = graft.core.Tables.orders(spark, sfDir)
      .join(graft.core.Tables.lineitem(spark, sfDir)
        .groupBy("l_orderkey").agg(count(lit(1)).as("x")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderkey"), col("x"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def sp(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"cfi:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 6), 16) % 3
    }
    val parts = pts.groupBy(p => sp(p._1))
    val tr = parts(0L)
    val (n, sx, sy) = (BigInt(tr.length), BigInt(tr.map(_._2).sum), BigInt(tr.map(_._3).sum))
    val sxy = tr.map(p => BigInt(p._2) * p._3).sum
    val sxx = tr.map(p => BigInt(p._2) * p._2).sum
    val slope = ((n * sxy - sx * sy) * 1000000 / (n * sxx - sx * sx)).toLong
    val icept = ((sy * 1000000 - BigInt(slope) * sx) / n).toLong
    def resid(p: (Long, Long, Long)): Long =
      math.abs(p._3 * 1000000L - (slope * p._2 + icept))
    val cal = parts(1L).map(p => (resid(p), p._1)).sortBy(identity)
    val nCal = cal.length.toLong
    val k = cal.indices.find(i =>
      (i + 1) * 1000L >= (nCal + 1) * (1000 - Conformal.AlphaPermille)).get
    val qhat = cal(k)._1
    val ev = parts(2L)
    val covered = ev.count(resid(_) <= qhat).toLong
    val r = Conformal.conformalInterval(spark, sfDir).collect()(0)
    assert(r.getLong(0) == tr.length && r.getLong(1) == nCal
      && r.getLong(2) == ev.length)
    assert(r.getLong(3) == slope, s"slope ${r.getLong(3)} vs $slope")
    assert(r.getLong(4) == icept)
    assert(r.getLong(5) == qhat)
    assert(r.getLong(6) == covered)
    assert(r.getLong(7) == covered * 1000000L / ev.length)
    // distribution-free guarantee: coverage near 1 - alpha
    val cov = covered.toDouble / ev.length
    assert(cov >= 0.85 && cov <= 1.0, s"coverage $cov out of band")
  }
}
