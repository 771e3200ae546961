package graft

import org.apache.spark.sql.functions._
import graft.queries.{Dedup, Scurve}

/** lsh_scurve contracts: the measurement reconciles with the exact
  * pair set, and the measured collision counts sit inside a 4σ
  * binomial band around the theoretical S-curve Σ 1−(1−s³)¹⁶ over
  * the actual pair Jaccards — the statistical certificate that the
  * md5 hash family behaves like the independent-permutation model.
  */
class ScurveSpec extends SparkSuite {

  test("lsh_scurve matches pair censuses and the theoretical S-curve band") {
    val jacs = Dedup.ngramScored(graft.core.Tables.documents(spark, sfDir))
      .select("jac").collect().map(_.getDouble(0))
    val got = Scurve.lshScurve(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.values.map(_._1).sum == jacs.length.toLong,
      "bucket pair counts must cover every exact pair")
    got.foreach { case (b, (n, c, rate)) =>
      assert(b >= 0 && b <= 10 && c <= n)
      assert(rate == c * 1000000L / n)
    }
    // binomial band per bucket: E = Σ p(s), Var = Σ p(1−p)
    def p(s: Double): Double = 1.0 - math.pow(1.0 - s * s * s, 16)
    jacs.groupBy(j => math.floor(j * 10).toLong).foreach { case (b, js) =>
      val e = js.map(p).sum
      val sd = math.sqrt(js.map(x => p(x) * (1 - p(x))).sum)
      val c = got(b)._2.toDouble
      assert(math.abs(c - e) <= 4 * sd + 5,
        s"bucket $b: measured $c vs theory $e ± $sd — hash family off-model")
    }
  }
}
