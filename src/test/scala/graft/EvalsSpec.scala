package graft

import graft.queries.Evals

/** ROUGE/BLEU lead-vs-body contracts: per-source averages equal a
  * sequential recompute of the clipped-match chain, and every metric
  * respects its [0, 1] bound in micro units.
  */
class EvalsSpec extends SparkSuite {

  private def tokens(text: String): Array[String] =
    "[^\\p{L}]+".r.split(text).filter(_.nonEmpty)

  private def ngrams(ws: Seq[String], n: Int): Seq[String] =
    if (ws.length < n) Seq.empty
    else ws.sliding(n).map(_.mkString(" ")).toSeq

  private def clipped(a: Seq[String], b: Seq[String]): Long = {
    val ca = a.groupBy(identity).view.mapValues(_.length)
    val cb = b.groupBy(identity).view.mapValues(_.length)
    ca.map { case (g, n) => math.min(n, cb.getOrElse(g, 0)).toLong }.sum
  }

  /** (source, c_len, b_len, m1, m2) rows mirroring Evals.perDoc. */
  private def perDoc: Seq[(String, Int, Int, Long, Long)] =
    graft.core.Tables.documents(spark, sfDir)
      .select("source", "text").collect()
      .map(r => (r.getString(0), tokens(r.getString(1)).toSeq))
      .filter(_._2.length >= 10)
      .map { case (src, ws) =>
        val c = math.ceil(ws.length / 5.0).toInt
        val (lead, body) = ws.splitAt(c)
        (src, c, body.length,
          clipped(lead, body),
          clipped(ngrams(lead, 2), ngrams(body, 2)))
      }.toSeq

  private def micro(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong

  test("eval_rouge equals the sequential clipped-recall recompute") {
    val expect = perDoc.groupBy(_._1).map { case (src, rows) =>
      val r1 = rows.map(r => micro(r._4.toDouble / r._3)).sum / rows.size
      val r2 = rows.map(r => micro(r._5.toDouble / (r._3 - 1))).sum / rows.size
      (src, rows.size.toLong, r1, r2)
    }.toSet
    val got = Evals.evalRouge(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expect)
    got.foreach { case (src, _, r1, r2) =>
      assert(r1 >= 0 && r1 <= 1000000L && r2 >= 0 && r2 <= 1000000L,
        s"$src ROUGE outside [0,1]")
    }
  }

  test("eval_bleu equals the sequential clipped-precision recompute") {
    val expect = perDoc.groupBy(_._1).map { case (src, rows) =>
      val p1 = rows.map(r => micro(r._4.toDouble / r._2)).sum / rows.size
      val p2 = rows.map(r => micro(r._5.toDouble / (r._2 - 1))).sum / rows.size
      val bl = rows.map { r =>
        micro(math.exp(1.0 - r._3.toDouble / r._2) *
          math.sqrt((r._4.toDouble / r._2) * (r._5.toDouble / (r._2 - 1))))
      }.sum / rows.size
      (src, rows.size.toLong, p1, p2, bl)
    }.toSet
    val got = Evals.evalBleu(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expect)
    // lead is 20% of the doc: the brevity penalty caps BLEU well under
    // the precision legs
    got.foreach { case (src, _, p1, _, bl) =>
      assert(p1 <= 1000000L && bl <= p1, s"$src BLEU above its precision leg")
    }
  }

  test("eval_chrf equals the sequential char-n-gram recompute") {
    def charGrams(s: String, n: Int): Seq[String] =
      if (s.length < n) Seq.empty
      else (0 to s.length - n).map(i => s.substring(i, i + n))
    val perDocF = graft.core.Tables.documents(spark, sfDir)
      .select("source", "text").collect()
      .map(r => (r.getString(0), tokens(r.getString(1)).toSeq))
      .filter(_._2.length >= 10)
      .map { case (src, ws) =>
        val c = math.ceil(ws.length / 5.0).toInt
        val (lead, body) = ws.splitAt(c)
        val (cand, ref) = (lead.mkString(" "), body.mkString(" "))
        def f(n: Int): Long = {
          val (ca, cb) = (charGrams(cand, n), charGrams(ref, n))
          val m = clipped(ca, cb)
          math.floor(5.0 * m * 1e6 / (ca.length + 4L * cb.length) + 0.5).toLong
        }
        val (f2, f3) = (f(2), f(3))
        (src, f2, f3, (f2 + f3 + 1) / 2)
      }.toSeq
    val expect = perDocF.groupBy(_._1).map { case (src, rows) =>
      (src, rows.size.toLong, rows.map(_._2).sum / rows.size,
        rows.map(_._3).sum / rows.size, rows.map(_._4).sum / rows.size)
    }.toSet
    val got = Evals.evalChrf(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expect)
    got.foreach { case (src, _, f2, f3, fb) =>
      assert(f2 >= 0 && f2 <= 1000000L && f3 >= 0 && f3 <= 1000000L
        && fb <= 1000000L, s"$src chrF outside [0,1]")
    }
  }

  test("eval_distinct_n equals the sequential diversity recompute; pooled <= per-doc") {
    def micro(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong
    val base = graft.core.Tables.documents(spark, sfDir)
      .select("source", "text").collect()
      .map(r => (r.getString(0), tokens(r.getString(1)).toSeq))
      .filter(_._2.length >= 2)
    val exp = base.groupBy(_._1).map { case (src, g) =>
      val d1s = g.map { case (_, ws) =>
        micro(ws.distinct.size.toDouble / ws.size) }
      val d2s = g.map { case (_, ws) =>
        val b2 = ws.zip(ws.tail).map { case (a, b) => s"$a $b" }
        micro(b2.distinct.size.toDouble / b2.size)
      }
      val all = g.flatMap(_._2)
      src -> (g.length.toLong, d1s.sum / g.length, d2s.sum / g.length,
        micro(all.distinct.size.toDouble / all.size))
    }
    val got = Evals.evalDistinctN(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(got.keySet == exp.keySet)
    exp.foreach { case (src, e) => assert(got(src) == e, s"source $src") }
    // ratios live in [0, 1]; cross-doc repetition is visible: the
    // pooled ratio sits below 1 even where per-doc ratios are high
    got.values.foreach { case (_, d1, d2, pooled) =>
      assert(d1 <= 1000000L && d2 <= 1000000L && pooled <= 1000000L)
    }
    assert(got.values.exists { case (_, d1, _, pooled) => pooled < d1 },
      "pooled diversity never dropped below per-doc average — " +
        "cross-doc repetition invisible")
  }

  test("eval_pass_at_k equals the sequential binomial recompute; boundary hits 1") {
    val Stop = Set("the", "a", "of", "and", "to", "in", "is", "it")
    val cells = graft.core.Tables.documents(spark, sfDir)
      .select("source", "text").collect()
      .map(r => (r.getString(0), tokens(r.getString(1)).toSeq))
      .filter(_._2.nonEmpty)
      .map { case (src, ws) =>
        (src, if (ws.count(Stop).toDouble / ws.length >= 0.11) 1L else 0L)
      }
    val exp = cells.groupBy(_._1).collect {
      case (src, g) if g.length >= 10 =>
        val n = g.length.toLong
        val c = g.map(_._2).sum
        val prod = (0 until 10).map(i =>
          (n - c - i).toDouble / (n - i).toDouble).reduceLeft(_ * _)
        src -> (n, c,
          math.floor(c.toDouble / n * 1e6 + 0.5).toLong,
          math.floor((1.0 - prod) * 1e6 + 0.5).toLong)
    }
    val got = Evals.evalPassAtK(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.keySet == exp.keySet)
    exp.foreach { case (src, e) => assert(got(src) == e, s"source $src") }
    // boundary semantics: fewer than k gate-failing docs forces a zero
    // factor and pass@k = 1 exactly
    exp.values.foreach { case (n, c, _, p10) =>
      if (n - c < 10) assert(p10 == 1000000L)
      assert(p10 >= 0 && p10 <= 1000000L)
    }
  }

  // ---- shared sequential BM25 index mirror (corpus = doc_id >= 5) ----
  private lazy val allDocs: Map[Long, Seq[String]] =
    graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> tokens(r.getString(1)).toSeq).toMap
  private lazy val corpusDocs = allDocs.filter(_._1 >= 5)
  private lazy val bmTf: Map[(Long, String), Long] = corpusDocs.toSeq
    .flatMap { case (d, ws) =>
      ws.groupBy(identity).map { case (t, g) => (d, t) -> g.length.toLong }
    }.toMap
  private lazy val bmDf =
    bmTf.keys.toSeq.groupBy(_._2).view.mapValues(_.length.toLong).toMap
  private lazy val bmDl = corpusDocs.view.mapValues(_.length.toLong).toMap
  private lazy val bmTotal = bmDl.values.sum.toDouble
  private lazy val bmN = corpusDocs.size.toLong
  private def bmCint(d: Long, t: String): Long = {
    val idf = math.floor(math.log((bmN - bmDf(t) + 0.5) / (bmDf(t) + 0.5)
      + 1.0) * 1e6 + 0.5) / 1e6
    val ntd = bmTf((d, t)).toDouble
    math.floor(idf * (ntd * 2.2)
      / (ntd + 1.2 * (0.25 + 0.75 * bmDl(d) / (bmTotal / bmN)))
      * 1e9 + 0.5).toLong
  }
  /** Top-k BM25 docs for a query-term multiset, mirror of the ranker. */
  private def bmTopK(keys: Seq[String], k: Int): Seq[Long] =
    corpusDocs.keys.toSeq.collect {
      case d if keys.exists(t => bmTf.contains((d, t))) =>
        d -> keys.filter(t => bmTf.contains((d, t))).map(t => bmCint(d, t)).sum
    }.sortBy { case (d, s) => (-s, d) }.take(k).map(_._1)

  test("search_rank_eval equals the sequential BM25 + conjunctive-truth recompute") {
    val all = allDocs
    val corpus = corpusDocs
    val qs = all.collect { case (q, ws) if q < 5 && ws.length >= 5 =>
      q -> Seq(ws(0), ws(2), ws(4))
    }
    val tf = bmTf
    def cint(d: Long, t: String): Long = bmCint(d, t)
    val k = graft.queries.TextOps.SearchTopK
    val dcgW = (1 to k).map(i =>
      math.floor(1e6 / (math.log(i + 1.0) / math.log(2.0)) + 0.5).toLong)
    val cumW = dcgW.scanLeft(0L)(_ + _).tail
    val expect = qs.map { case (q, keys) =>
      val scored = corpus.keys.toSeq.collect {
        case d if keys.exists(t => tf.contains((d, t))) =>
          d -> keys.filter(t => tf.contains((d, t))).map(t => cint(d, t)).sum
      }
      val ranked = scored.sortBy { case (d, s) => (-s, d) }.take(k).map(_._1)
      val relSet = corpus.collect {
        case (d, ws) if keys.distinct.forall(ws.contains) => d
      }.toSet
      val hitRanks = ranked.zipWithIndex.collect {
        case (d, i) if relSet(d) => i + 1
      }
      val fr = if (hitRanks.isEmpty) 0 else hitRanks.min
      val dcg = hitRanks.map(i => dcgW(i - 1)).sum
      val nRel = relSet.size.toLong
      q -> (nRel, hitRanks.length.toLong, fr,
        if (fr == 0) 0L else math.floor(1e6 / fr + 0.5).toLong,
        if (nRel == 0) 0L
        else math.floor(dcg.toDouble * 1e6
          / cumW(math.min(nRel, k.toLong).toInt - 1) + 0.5).toLong)
    }
    val got = Evals.searchRankEval(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getInt(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (q, e) => assert(got(q) == e, s"query $q") }
    // the conjunctive truth and the metrics are live at this SF
    assert(expect.values.exists(_._1 > 0), "no query has any relevant doc")
    got.values.foreach { case (_, _, _, mrr, ndcg) =>
      assert(mrr >= 0 && mrr <= 1000000L && ndcg >= 0 && ndcg <= 1000000L)
    }
  }

  test("search_expand_prf equals the sequential RM3 term mining") {
    val queries = allDocs.collect { case (q, ws) if q < 5 && ws.nonEmpty =>
      q -> ws.distinct
    }
    val expect = queries.flatMap { case (q, qset) =>
      val fb = bmTopK(qset, Evals.PrfFbDocs)
      val cand = fb.flatMap(d => corpusDocs(d).distinct.map(t => t -> bmCint(d, t)))
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
        .filterNot { case (t, _) => qset.contains(t) }
      cand.toSeq.sortBy { case (t, w) => (-w, t) }
        .take(Evals.PrfExpK).zipWithIndex
        .map { case ((t, w), i) => (q, i + 1, t, w) }
    }.toSet
    val got = Evals.searchExpandPrf(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
      .toSet
    assert(got == expect)
    // expansion is live: every query with feedback docs gains NEW
    // terms, none of which echo the query
    assert(got.nonEmpty)
    got.foreach { case (q, _, t, w) =>
      assert(!queries(q).contains(t), s"query $q expanded with its own term $t")
      assert(w > 0L)
    }
  }
}
