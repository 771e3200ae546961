package graft

import graft.queries.Entropy

/** token_entropy contracts: equals a sequential recompute with the
  * identical per-term quantized chain, and sits in (0, ln(vocab)].
  */
class EntropySpec extends SparkSuite {

  test("token_entropy equals the sequential recompute") {
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expect = docs.groupBy(_._1).map { case (src, ds) =>
      val ws = ds.flatMap(d => "[^\\p{L}]+".r.split(d._2).filter(_.nonEmpty))
      val n = ws.length.toLong
      val cnt = ws.groupBy(identity).view.mapValues(_.length.toLong)
      val h = cnt.values.map { nw =>
        math.floor((nw.toDouble / n) * math.log(n.toDouble / nw) * 1e9 + 0.5).toLong
      }.sum
      src -> (n, cnt.size.toLong, h)
    }
    val got = Entropy.tokenEntropy(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == expect)
    got.foreach { case (src, (_, v, h)) =>
      assert(h > 0 && h.toDouble / 1e9 <= math.log(v.toDouble) + 1e-6,
        s"$src entropy outside (0, ln vocab]")
    }
  }

  test("source_divergence_js equals the sequential recompute; JS in [0, ln 2]") {
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    // counts per source; legs mirror the operator's EXACT float form
    // (nw/n)·ln(n/nw) — not the algebraically-equal x·ln(1/x), which
    // can differ by an ulp
    val counts = docs.groupBy(_._1).map { case (src, ds) =>
      val ws = ds.flatMap(d => "[^\\p{L}]+".r.split(d._2).filter(_.nonEmpty))
      src -> (ws.groupBy(identity).view.mapValues(_.length.toLong).toMap,
        ws.length.toLong)
    }
    def legNano(cnt: Map[String, Long], n: Long): Long =
      cnt.values.map { nw =>
        math.floor((nw.toDouble / n) * math.log(n.toDouble / nw) * 1e9 + 0.5).toLong
      }.sum
    // the mixture term mirrors the operator's p_half form (nw/n)/2
    def half(cnt: Map[String, Long], n: Long, w: String): Double =
      cnt.get(w).map(_.toDouble / n / 2).getOrElse(0.0)
    val expect = (for {
      (a, (ca, na)) <- counts; (b, (cb, nb)) <- counts if a < b
    } yield {
      val hm = (ca.keySet ++ cb.keySet).toSeq.map { w =>
        val m = half(ca, na, w) + half(cb, nb, w)
        math.floor(m * math.log(1.0 / m) * 1e9 + 0.5).toLong
      }.sum
      val (hp, hq) = (legNano(ca, na), legNano(cb, nb))
      (a, b) -> (hm, hp, hq, hm - (hp + hq) / 2)
    }).toMap
    val got = graft.queries.Entropy.sourceDivergenceJs(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got == expect)
    val ln2nano = (math.log(2) * 1e9).toLong
    got.foreach { case (pair, (_, _, _, js)) =>
      // ≥ −2 absorbs the documented ≤1-nano DIV floor + term rounding
      assert(js >= -2 && js <= ln2nano + 2, s"$pair JS $js outside [0, ln 2]")
    }
  }

  test("lm_cross_ppl: diagonal is the in-domain minimum of each eval column") {
    val rows = graft.queries.Entropy.lmCrossPpl(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(5)))
    val sources = rows.map(_._1).distinct
    assert(rows.length == sources.length * sources.length, "full S x S matrix")
    // diagonal: zero OOV (its own vocabulary), and the in-domain model
    // should never be beaten at scoring its own source
    rows.filter(r => r._1 == r._2).foreach { case (s0, _, _, oov, _) =>
      assert(oov == 0L, s"$s0 self-pair has OOV tokens")
    }
    sources.foreach { ev =>
      val col0 = rows.filter(_._2 == ev)
      val self = col0.find(_._1 == ev).get._5
      val best = col0.map(_._5).min
      assert(self == best,
        s"eval $ev: a foreign model ($best) beats the in-domain model ($self)")
    }
    // sequential recompute of one full column under the exact chain
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val counts = docs.groupBy(_._1).map { case (src, ds) =>
      val ws = ds.flatMap(d => "[^\\p{L}]+".r.split(d._2).filter(_.nonEmpty))
      src -> ws.groupBy(identity).view.mapValues(_.length.toLong).toMap
    }
    val ev0 = sources.min
    val ce = counts(ev0); val nEval = ce.values.sum
    counts.foreach { case (tr, ct) =>
      val denom = (ct.values.sum + ct.size).toDouble
      val matchedNano = ce.collect { case (w, c) if ct.contains(w) =>
        math.floor(c * math.log(denom / (ct(w) + 1)) * 1e9 + 0.5).toLong
      }.sum
      val matchedInst = ce.collect { case (w, c) if ct.contains(w) => c }.sum
      val oov = nEval - matchedInst
      val expect = matchedNano + oov * math.floor(math.log(denom) * 1e9 + 0.5).toLong
      val got = rows.find(r => r._1 == tr && r._2 == ev0).get
      assert(got._5 == expect / nEval && got._4 == oov,
        s"($tr -> $ev0) mismatch")
    }
  }

  test("source_divergence_js: a source mixed with itself reads JS = 0") {
    // identical distributions p = q make m = p, so hm = hp = hq and
    // js = hm - (2*hm) DIV 2 = 0 exactly — verified through the same
    // quantized chain the operator uses
    val p = Map("a" -> 0.5, "b" -> 0.25, "c" -> 0.25)
    def hNano(xs: Iterable[Double]): Long =
      xs.map(x => math.floor(x * math.log(1.0 / x) * 1e9 + 0.5).toLong).sum
    val m = p.map { case (_, v) => v / 2 + v / 2 }
    assert(hNano(m) - (hNano(p.values) + hNano(p.values)) / 2 == 0L)
  }
}
