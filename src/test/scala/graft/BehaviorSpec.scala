package graft

import graft.queries.Behavior
import org.apache.spark.sql.functions._

/** Behavioral-diagnostics contracts: burstiness, confusion cells, and
  * lift all equal sequential set/count algebra. Cross-engine hashes
  * live under the DuckDB gate.
  */
class BehaviorSpec extends SparkSuite {

  test("anomaly_burst equals per-user hourly cell algebra") {
    val ev = graft.core.Tables.events(spark, sfDir)
      .select(col("user_id"), expr("ts DIV 3600000000000")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val exp = ev.groupBy(_._1).map { case (u, es) =>
      val cells = es.groupBy(_._2).map(_._2.length.toLong)
      val (nh, mx, tot) = (cells.size.toLong, cells.max, cells.sum)
      u -> (nh, mx, tot, mx * 1000000L * nh / tot)
    }
    val got = Behavior.anomalyBurst(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
      .toMap
    assert(got.size == exp.size)
    exp.foreach { case (u, (nh, mx, tot, ratio)) =>
      val (gn, gm, gt, gr, flag) = got(u)
      assert(gn == nh && gm == mx && gt == tot && gr == ratio, s"user $u")
      assert(flag == (ratio >= Behavior.BurstRatioMicro))
    }
  }

  test("langid_confusion cells recompose lang_id and recalls sum to one") {
    val preds = graft.queries.TextOps.langId(spark, sfDir)
      .select("lang", "pred_lang").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val exp = preds.groupBy(identity).map { case (k, g) => k -> g.length.toLong }
    val got = Behavior.langidConfusion(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap
    assert(got.size == exp.size)
    exp.foreach { case ((lang, pred), n) =>
      val (gn, nLang, share, correct) = got((lang, pred))
      assert(gn == n)
      assert(nLang == preds.count(_._1 == lang))
      assert(share == n * 1000000L / nLang)
      assert(correct == (lang == pred))
    }
    // per true label, cell counts sum to the label total
    got.groupBy(_._1._1).foreach { case (_, cells) =>
      val nLang = cells.values.head._2
      assert(cells.values.map(_._1).sum == nLang)
    }
  }

  test("event_type_lift equals user-set intersection algebra") {
    val ut = graft.core.Tables.events(spark, sfDir)
      .select("user_id", "event_type").distinct().collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byType = ut.groupBy(_._2).map { case (t, g) => t -> g.map(_._1).toSet }
    val nU = ut.map(_._1).distinct.length.toLong
    val types = byType.keys.toSeq.sorted
    val got = Behavior.eventTypeLift(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    for (a <- types; b <- types if a < b) {
      val both = (byType(a) & byType(b)).size.toLong
      if (both > 0) {
        val (gb, na, nb, gnu, lift) = got((a, b))
        assert(gb == both && na == byType(a).size && nb == byType(b).size)
        assert(gnu == nU)
        assert(lift == both * nU * 1000000L / (na * nb), s"pair ($a,$b)")
      } else assert(!got.contains((a, b)))
    }
  }
}
