package graft

import graft.queries.{Classifier, EventOps}

/** KS-drift and calibration-report contracts: sequential recomputes
  * and structural invariants. Values live under the DuckDB gate.
  */
class DriftSpec extends SparkSuite {

  test("drift_ks ≡ sequential two-sample KS recompute") {
    val ev = graft.core.Tables.events(spark, sfDir)
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val a = ev.filter(_._1 == "view").map(_._2).sorted
    val b = ev.filter(_._1 == "purchase").map(_._2).sorted
    val values = (a ++ b).distinct.sorted
    def cdf(xs: Array[Double])(v: Double) =
      xs.count(_ <= v).toDouble / xs.length
    val dq = values.map(v =>
      v -> math.floor(math.abs(cdf(a)(v) - cdf(b)(v)) * 1e6 + 0.5).toLong)
    val ksQ = dq.map(_._2).max
    val at = dq.filter(_._2 == ksQ).map(_._1).min
    val r = EventOps.driftKs(spark, sfDir).collect()(0)
    assert(r.getLong(0) === a.length.toLong)
    assert(r.getLong(1) === b.length.toLong)
    assert(r.getDouble(2) === ksQ / 1e6)
    assert(r.getDouble(3) === at)
  }

  test("calibration deciles partition docs and mean margins are monotone") {
    val rows = Classifier.classifierCalibration(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq === (1 to 10))
    val total = rows.map(_._2).sum
    val nDocs = graft.core.Tables.documents(spark, sfDir).count()
    assert(total === nDocs, s"deciles cover $total of $nDocs docs")
    // ntile over ascending margin: decile mean margins must be monotone
    val means = rows.map(_._3)
    assert(means.zip(means.tail).forall { case (x, y) => x <= y }, means.toSeq)
    rows.foreach { case (_, _, _, pr) => assert(pr >= 0.0 && pr <= 1.0) }
  }
}
