package graft

import graft.queries.Stats
import org.apache.spark.sql.functions._

/** Statistical-operator contracts: Kaplan-Meier against a sequential
  * reference, chi-square cell arithmetic, and Pearson values against
  * naive in-JVM computation. Cross-engine hashes live under the
  * DuckDB gate.
  */
class StatsSpec extends SparkSuite {

  test("survival_km equals the sequential Kaplan-Meier estimator") {
    val ev = graft.core.Tables.events(spark, sfDir)
      .select(col("user_id"), expr("ts DIV 1000000000 DIV 86400").as("day"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byUser = ev.groupBy(_._1)
    val life = byUser.toSeq.map { case (_, es) =>
      val d0 = es.map(_._2).min
      val purch = es.filter(_._3 == "purchase").map(_._2)
      if (purch.nonEmpty) (purch.min - d0, true) else (es.map(_._2).max - d0, false)
    }.toSeq
    var atRisk = life.size
    var surv = 1.0
    val expected = life.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (t, ls) =>
      val d = ls.count(_._2)
      val c = ls.size - d
      val row = if (d > 0) {
        val f = (atRisk - d).toDouble / atRisk.toDouble
        surv *= f
        Some((t, atRisk.toLong, d.toLong, surv))
      } else None
      atRisk -= (d + c)
      row
    }
    val got = Stats.survivalKm(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1).toSeq
    assert(got == expected, s"\n got $got\n exp $expected")
    // curve invariants
    got.sliding(2).foreach {
      case Seq(a, b) =>
        assert(a._4 >= b._4, "survival must be nonincreasing")
        assert(a._2 > b._2, "at-risk must shrink")
      case _ =>
    }
    got.foreach { case (_, n, d, sv) =>
      assert(d >= 1 && d <= n); assert(sv >= 0.0 && sv <= 1.0)
    }
  }

  test("ab_test_chi2 cells recompute and the statistic is their sum") {
    val rows = Stats.abTestChi2(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    val n = rows.map(_._3).sum.toDouble
    val rt = rows.groupBy(_._1).map { case (a, rs) => a -> rs.map(_._3).sum.toDouble }
    val ct = rows.groupBy(_._2).map { case (t, rs) => t -> rs.map(_._3).sum.toDouble }
    var chi2 = 0L
    rows.foreach { case (arm, tpe, o, eMicro, contribMicro, _, dof) =>
      val e = rt(arm) * ct(tpe) / n
      assert(eMicro == math.floor(e * 1e6 + 0.5).toLong, s"e for ($arm,$tpe)")
      val contrib = (o.toDouble - e) * (o.toDouble - e) / e
      assert(contribMicro == math.floor(contrib * 1e6 + 0.5).toLong, s"contrib for ($arm,$tpe)")
      chi2 += contribMicro
      assert(dof == (rt.size - 1).toLong * (ct.size - 1).toLong)
    }
    assert(rows.map(_._6).distinct.toSeq == Seq(chi2), "chi2 must equal the cell sum")
  }

  test("corr_matrix matches naive Pearson on the quantized columns") {
    val li = graft.core.Tables.lineitem(spark, sfDir)
      .select("l_quantity", "l_extendedprice", "l_discount", "l_tax").collect()
    val cols = Map(
      "quantity" -> li.map(r => math.floor(r.getDouble(0) + 0.5)),
      "extendedprice" -> li.map(r => math.floor(r.getDouble(1) * 100 + 0.5)),
      "discount" -> li.map(r => math.floor(r.getDouble(2) * 100 + 0.5)),
      "tax" -> li.map(r => math.floor(r.getDouble(3) * 100 + 0.5)))
    def pearson(a: Array[Double], b: Array[Double]): Double = {
      val n = a.length.toDouble
      val ma = a.sum / n; val mb = b.sum / n
      val cov = a.zip(b).map { case (x, y) => (x - ma) * (y - mb) }.sum
      val va = a.map(x => (x - ma) * (x - ma)).sum
      val vb = b.map(y => (y - mb) * (y - mb)).sum
      cov / math.sqrt(va * vb)
    }
    val got = Stats.corrMatrix(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3)))).toMap
    assert(got.size == 6, "4 columns -> 6 unordered pairs")
    got.foreach { case ((a, b), (n, corr)) =>
      assert(n == li.length)
      assert(corr >= -1.0 && corr <= 1.0)
      val exp = pearson(cols(a), cols(b))
      assert(math.abs(corr - exp) < 1e-5, s"($a,$b): $corr vs $exp")
    }
  }

  test("weighted_median equals brute-force weighted median per group") {
    val rows = graft.core.Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"),
        floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long"),
        floor(col("l_quantity") + lit(0.5)).cast("long")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = Stats.weightedMedian(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val tot = rs.map(_._3).sum
      val sorted = rs.groupBy(_._2).map { case (v, g2) => v -> g2.map(_._3).sum }
        .toSeq.sortBy(_._1)
      var cum = 0L
      val med = sorted.find { case (_, w) => cum += w; cum * 2 >= tot }.get._1
      assert(got(g) == (tot, med), s"group $g")
    }
    assert(got.keySet == rows.map(_._1).toSet)
  }

  test("benford_screen chi-square terms match manual computation") {
    val cents = graft.core.Tables.orders(spark, sfDir)
      .select(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
      .collect().map(_.getLong(0))
    val obs = cents.map(_.toString.charAt(0).asDigit.toLong)
      .groupBy(identity).map { case (k, g) => k -> g.length.toLong }
    val n = cents.length.toLong
    val got = Stats.benfordScreen(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.length == 9)
    var chi2 = 0L
    val exp = (1L to 9L).map { d =>
      val e = n * math.log10(1.0 + 1.0 / d)
      val o = obs.getOrElse(d, 0L)
      val t = math.floor((o - e) * (o - e) / e * 1e6 + 0.5).toLong
      chi2 += t
      d -> (o, math.floor(e * 1e6 + 0.5).toLong, t)
    }.toMap
    got.foreach { case (d, o, gn, em, tm, c2) =>
      val (eo, ee, et) = exp(d)
      assert(o == eo && gn == n && em == ee && tm == et, s"digit $d")
      assert(c2 == chi2)
    }
  }

  test("did_readout equals the manual four-cell estimate") {
    val ev = graft.core.Tables.events(spark, sfDir)
      .select((col("user_id") % 2), expr("ts DIV 86400000000000"),
        floor(col("value") * 100 + lit(0.5)).cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val mid = (ev.map(_._2).min + ev.map(_._2).max + 1) / 2
    def cell(t: Long, post: Boolean) = {
      val c = ev.filter(e => e._1 == t && (if (post) e._2 >= mid else e._2 < mid))
      (c.length.toLong, c.map(_._3).sum)
    }
    val (ntp, stp) = cell(1, false); val (ntq, stq) = cell(1, true)
    val (ncp, scp) = cell(0, false); val (ncq, scq) = cell(0, true)
    val r = Stats.didReadout(spark, sfDir).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      == ((ntp, ntq, ncp, ncq)))
    val (mtp, mtq, mcp, mcq) =
      (stp * 10000 / ntp, stq * 10000 / ntq, scp * 10000 / ncp, scq * 10000 / ncq)
    assert(r.getLong(4) == mtp && r.getLong(5) == mtq)
    assert(r.getLong(6) == mcp && r.getLong(7) == mcq)
    assert(r.getLong(8) == (mtq - mtp) - (mcq - mcp))
  }

  test("robust_stats equals the sequential rank-based recompute") {
    def toks(text: String): Long =
      "[^\\p{L}]+".r.split(text).count(_.nonEmpty).toLong
    val lens = graft.core.Tables.documents(spark, sfDir)
      .select("source", "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), toks(r.getString(2))))
    val exp = lens.groupBy(_._1).map { case (src, g) =>
      val sorted = g.sortBy(r => (r._3, r._2))
      val n = sorted.length
      val cut = n / 10
      val p50 = sorted((n + 1) / 2 - 1)._3
      val loVal = sorted(cut)._3
      val hiVal = sorted(n - cut - 1)._3
      val trimmed = sorted.slice(cut, n - cut).map(_._3)
      val devs = g.map(r => (math.abs(r._3 - p50), r._2)).sortBy(identity)
      val mad = devs((n + 1) / 2 - 1)._1
      val wins = g.map(r => math.max(math.min(r._3, hiVal), loVal)).sum
      src -> (n.toLong, p50, mad,
        math.floor(trimmed.sum.toDouble * 1e6 / (n - 2 * cut) + 0.5).toLong,
        math.floor(wins.toDouble * 1e6 / n + 0.5).toLong)
    }
    val got = Stats.robustStats(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(got.keySet == exp.keySet)
    exp.foreach { case (src, e) => assert(got(src) == e, s"source $src") }
    // robustness sanity: winsorized/trimmed means sit within the
    // clamp rails, and MAD is a genuine spread (nonzero somewhere)
    exp.values.foreach { case (_, p50, mad, tm, wm) =>
      assert(p50 > 0 && tm > 0 && wm > 0 && mad >= 0)
    }
    assert(exp.values.exists(_._3 > 0), "MAD degenerate everywhere")
  }
}
