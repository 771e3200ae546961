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
}
