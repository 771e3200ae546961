package graft

import graft.queries.Profiling
import org.apache.spark.sql.functions._

/** Profiling-operator contracts: FK discovery against set algebra on
  * collected columns, MI against naive computation, ACF against a
  * sequential reference. Cross-engine hashes live under the DuckDB
  * gate.
  */
class ProfilingSpec extends SparkSuite {

  test("fk_discovery containment equals set algebra; known FKs flagged") {
    val sets: Map[String, Set[Long]] = Profiling.KeyCols.map { case (t, c) =>
      s"$t.$c" -> spark.read.parquet(s"$sfDir/$t.parquet")
        .select(col(c).cast("long")).distinct().collect().map(_.getLong(0)).toSet
    }.toMap
    val rows = Profiling.fkDiscovery(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6)))).toMap
    assert(rows.nonEmpty)
    rows.foreach { case ((ch, pa), (nc, np, common, frac, incl)) =>
      val (sc, sp) = (sets(ch), sets(pa))
      assert(nc == sc.size && np == sp.size)
      assert(common == (sc & sp).size, s"$ch ⊆ $pa common")
      assert(frac == common * 1000000L / nc)
      assert(incl == (common == nc))
    }
    // every overlapping pair is present
    for (a <- sets.keys; b <- sets.keys if a != b && (sets(a) & sets(b)).nonEmpty)
      assert(rows.contains((a, b)), s"missing pair $a -> $b")
    // the star schema's real FKs must be discovered as inclusions
    Seq("lineitem.l_orderkey" -> "orders.o_orderkey",
      "orders.o_custkey" -> "customer.c_custkey",
      "lineitem.l_partkey" -> "part.p_partkey",
      "nation.n_regionkey" -> "region.r_regionkey").foreach { p =>
      assert(rows(p)._5, s"FK $p not flagged as inclusion")
    }
  }

  test("fd_discovery verdicts equal per-group set algebra") {
    val got = Profiling.fdDiscovery(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getString(2)),
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6)))).toMap
    assert(got.size == Profiling.FdPairs.size)
    Profiling.FdPairs.foreach { case (t, a, b) =>
      val pairs = spark.read.parquet(s"$sfDir/$t.parquet")
        .select(col(a).cast("string"), col(b).cast("string")).collect()
        .map(r => (r.getString(0), r.getString(1)))
      val groups = pairs.groupBy(_._1).map { case (_, g) => g.map(_._2).toSet.size }
      val (ng, nv, mf, holds) = got((t, a, b))
      assert(ng == groups.size, s"$t.$a n_groups")
      assert(nv == groups.count(_ > 1), s"$t.$a->$b violations")
      assert(mf == groups.max, s"$t.$a->$b fanout")
      assert(holds == (nv == 0))
    }
    // key-determined FDs must hold; known non-FDs must be violated
    assert(got(("nation", "n_nationkey", "n_name"))._4)
    assert(got(("orders", "o_orderkey", "o_custkey"))._4)
    assert(got(("documents", "doc_id", "source"))._4)
    assert(!got(("lineitem", "l_orderkey", "l_partkey"))._4)
  }

  test("changepoint_cusum equals the textbook recursive clamp") {
    val days = graft.core.Tables.events(spark, sfDir)
      .select(expr("ts DIV 86400000000000").as("day")).collect().map(_.getLong(0))
    val (d0, d1) = (days.min, days.max)
    val counts = days.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val xs = (d0 to d1).map(dd => counts.getOrElse(dd, 0L))
    val n = xs.length
    val sx = xs.sum
    val k = Profiling.CusumSlackPermille
    // textbook: C+_t = max(0, C+_{t-1} + x_t - mu - slack), scaled n*1000
    var (cp, cm) = (BigInt(0), BigInt(0))
    val exp = xs.map { x =>
      val zp = BigInt(n) * 1000 * x - BigInt(sx) * (1000 + k)
      val zm = BigInt(n) * 1000 * x - BigInt(sx) * (1000 - k)
      cp = (cp + zp).max(0)
      cm = (cm - zm).max(0)
      (cp.toLong, cm.toLong)
    }
    val got = Profiling.changepointCusum(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).sortBy(_._1)
    assert(got.length == n)
    got.zip(exp).zip(xs).zipWithIndex.foreach {
      case ((((day, x, gp, gm, _), (ep, em)), xv), i) =>
        assert(day == d0 + i && x == xv)
        assert(gp == ep, s"day $day C+: $gp vs $ep")
        assert(gm == em, s"day $day C-: $gm vs $em")
    }
    val peaks = got.filter(_._5)
    assert(peaks.length == 1)
    val best = got.maxBy(r => (math.max(r._3, r._4), -r._1))
    assert(peaks.head._1 == best._1)
  }

  test("mutual_info matches naive MI and is nonnegative") {
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select("source", "lang").collect().map(r => (r.getString(0), r.getString(1)))
    val n = docs.length.toDouble
    val cells = docs.groupBy(identity).map { case (k, g) => k -> g.length }
    val r = docs.groupBy(_._1).map { case (k, g) => k -> g.length }
    val s2 = docs.groupBy(_._2).map { case (k, g) => k -> g.length }
    var mi = 0L
    val got = Profiling.mutualInfo(spark, sfDir).collect()
      .map(x => ((x.getString(0), x.getString(1)),
        (x.getLong(2), x.getLong(3), x.getLong(4), x.getLong(5), x.getLong(6), x.getLong(7))))
    assert(got.length == cells.size)
    got.foreach { case ((src, lg), (c, rr, ss, nn, term, _)) =>
      assert(c == cells((src, lg)) && rr == r(src) && ss == s2(lg) && nn == n.toLong)
      val exp = math.floor(
        (c / n) * math.log(c.toDouble * n / (rr.toDouble * ss)) * 1e9 + 0.5).toLong
      assert(term == exp, s"term ($src,$lg): $term vs $exp")
      mi += term
    }
    got.foreach { case (_, (_, _, _, _, _, m)) => assert(m == mi) }
    // MI >= 0 up to quantization slack of one nano-nat per cell
    assert(mi >= -got.length)
  }

  test("ts_acf equals the sequential autocorrelation and acf(0) = 1") {
    val days = graft.core.Tables.events(spark, sfDir)
      .select(expr("ts DIV 86400000000000").as("day")).collect().map(_.getLong(0))
    val (d0, d1) = (days.min, days.max)
    val counts = days.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val xs = (d0 to d1).map(dd => counts.getOrElse(dd, 0L)).toArray
    val n = xs.length.toLong
    val sx = xs.sum
    val z = xs.map(x => BigInt(n) * BigInt(x) - BigInt(sx))
    val den = z.map(v => v * v).sum
    val got = Profiling.tsAcf(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(got.length == Profiling.AcfMaxLag + 1)
    got.foreach { case (lag, nPairs, acf) =>
      val k = lag.toInt
      assert(nPairs == n - k)
      val num = (0 until (n - k).toInt).map(t => z(t) * z(t + k)).sum
      val exp = math.floor(
        num.toDouble / den.toDouble * 1e6 + 0.5) / 1e6
      assert(acf == exp, s"lag $k: $acf vs $exp")
      assert(acf <= 1.0 && acf >= -1.0)
    }
    assert(got.head._3 == 1.0)
  }
}
