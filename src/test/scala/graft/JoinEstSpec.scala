package graft

import graft.queries.JoinEst
import org.apache.spark.sql.functions._

/** Join-size estimator contracts: the coordinated sample replays from
  * md5 order, the arithmetic matches a sequential replication, and
  * the estimate lands near the exact join size (k=256 ⇒ ~6% stderr;
  * generous band). Cross-engine hashes live under the DuckDB gate.
  */
class JoinEstSpec extends SparkSuite {

  private def md5h(seed: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(seed.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 12), 16)
  }

  test("join_size_est equals the sequential coordinated-sample estimate") {
    val fa = graft.core.Tables.orders(spark, sfDir)
      .groupBy("o_orderkey").agg(count(lit(1))).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fb = graft.core.Tables.lineitem(spark, sfDir)
      .groupBy("l_orderkey").agg(count(lit(1))).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dom = (fa.keySet ++ fb.keySet).toSeq
      .map(k => (md5h(s"jse:$k"), k)).sorted.take(JoinEst.K)
    val hk = dom.map(_._1).max
    val nSamp = dom.length.toLong
    val sumSamp = dom.map { case (_, k) =>
      fa.getOrElse(k, 0L) * fb.getOrElse(k, 0L) }.sum
    val exact = fa.keys.toSeq.map(k => fa(k) * fb.getOrElse(k, 0L)).sum
    val space = math.pow(2.0, 48.0)
    val dEst = math.floor((nSamp.toDouble - 1) * space / hk + 0.5).toLong
    val est = math.floor(
      sumSamp.toDouble * ((nSamp.toDouble - 1) * space / hk) / nSamp + 0.5).toLong
    val r = JoinEst.joinSizeEst(spark, sfDir).collect()(0)
    assert(r.getLong(0) == nSamp && r.getLong(1) == sumSamp)
    assert(r.getLong(2) == exact)
    assert(r.getLong(3) == dEst)
    assert(r.getLong(4) == est, s"est ${r.getLong(4)} vs $est")
    assert(r.getLong(5) ==
      math.floor((est.toDouble - exact) / exact * 1e6 + 0.5).toLong)
    // estimator quality: within 25% of exact at k=256
    assert(math.abs(est.toDouble - exact) / exact < 0.25,
      s"estimate $est too far from exact $exact")
  }
}
