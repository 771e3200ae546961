package graft

import graft.queries.TextLaws

/** Corpus-law contracts: each fit equals a sequential in-JVM recompute
  * of the identical quantized chain, and the fitted numbers sit in the
  * ranges the laws predict on natural-ish text.
  */
class TextLawsSpec extends SparkSuite {

  private def tokens(text: String): Array[String] =
    "[^\\p{L}]+".r.split(text).filter(_.nonEmpty)

  private def docs: Array[(Long, String)] =
    graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))

  private def lnMicro(x: Double): Long = math.floor(math.log(x) * 1e6 + 0.5).toLong

  /** (n, slope_micro, intercept_micro) by the module's exact OLS chain. */
  private def ols(pts: Seq[(Long, Long)]): (Long, Long, Long) = {
    val n = pts.size.toDouble
    val sx = pts.map(_._1).sum.toDouble
    val sy = pts.map(_._2).sum.toDouble
    val sxy = pts.map(p => p._1 * p._2).sum.toDouble
    val sxx = pts.map(p => p._1 * p._1).sum.toDouble
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    (pts.size.toLong, math.floor(slope * 1e6 + 0.5).toLong,
      math.floor((sy - slope * sx) / n + 0.5).toLong)
  }

  test("zipf_fit equals the sequential recompute; slope is negative") {
    val freq = docs.flatMap(d => tokens(d._2)).groupBy(identity)
      .view.mapValues(_.length.toLong).toSeq
    val ranked = freq.sortBy { case (w, c) => (-c, w) }.take(256).zipWithIndex
      .map { case ((_, c), i) => (lnMicro(i + 1.0), lnMicro(c.toDouble)) }
    val (n, slope, intercept) = ols(ranked)
    val row = TextLaws.zipfFit(spark, sfDir).collect().head
    assert(row.getLong(0) == n)
    assert(row.getLong(1) == freq.size.toLong)                 // vocab
    assert(row.getLong(2) == freq.map(_._2).sum)               // n_tokens
    assert(row.getLong(3) == slope && row.getLong(4) == intercept)
    assert(slope < 0, "token frequency must decay with rank")
  }

  test("heaps_law checkpoints: cumulative, monotone, and exactly the recompute") {
    val byDoc = docs.sortBy(_._1)
    val firstSeen = collection.mutable.Map.empty[String, Long]
    byDoc.foreach { case (id, t) =>
      tokens(t).foreach(w => if (!firstSeen.contains(w)) firstSeen(w) = id)
    }
    val buckets = byDoc.groupBy(d => d._1 / 32).toSeq.sortBy(_._1).map {
      case (b, ds) =>
        val nt = ds.map(d => tokens(d._2).length.toLong).sum
        val nv = firstSeen.count { case (_, fd) => ds.exists(_._1 == fd) }.toLong
        (b, nt, nv)
    }
    val expect = buckets.scanLeft((0L, 0L, 0L)) { case ((_, ct, cv), (b, nt, nv)) =>
      (b, ct + nt, cv + nv)
    }.drop(1)
    val got = TextLaws.heapsLaw(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(got == expect)
    assert(got.last._3 == firstSeen.size.toLong, "final vocab = distinct types")
    got.sliding(2).foreach { case Seq(a, b) =>
      assert(b._2 > a._2 && b._3 >= a._3, "cumulative counts must be monotone")
    case _ => ()
    }
  }

  test("heaps_fit equals the recompute; exponent b in (0, 1]") {
    val cps = TextLaws.heapsLaw(spark, sfDir).collect()
      .map(r => (lnMicro(r.getLong(1).toDouble), lnMicro(r.getLong(2).toDouble)))
    val (n, slope, intercept) = ols(cps.toSeq)
    val row = TextLaws.heapsFit(spark, sfDir).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) == ((n, slope, intercept)))
    // the synthetic corpus has a closed ~31-type vocabulary that
    // saturates within the first checkpoint — the diagnostic correctly
    // reads b = 0 (no growth); natural text would sit in (0, 1)
    assert(slope >= 0 && slope <= 1000000L,
      s"Heaps exponent ${slope / 1e6} outside [0, 1]")
  }

  test("token_burstiness equals the recompute; Fano >= the sub-Poisson floor") {
    val dTotal = docs.length.toLong
    val perDocCnt = docs.flatMap { case (id, t) =>
      tokens(t).groupBy(identity).map { case (w, ws) => (w, id, ws.length.toLong) }
    }
    val perTok = perDocCnt.groupBy(_._1).map { case (w, rows) =>
      (w, rows.length.toLong, rows.map(_._3).sum, rows.map(r => r._3 * r._3).sum)
    }.toSeq.sortBy { case (w, df, _, _) => (-df, w) }.take(64)
    val expect = perTok.map { case (w, df, tot, sq) =>
      val mean = tot.toDouble / dTotal
      val ex2 = sq.toDouble / dTotal
      (w, df, tot, math.floor((ex2 - mean * mean) / mean * 1e6 + 0.5).toLong)
    }.toSet
    val got = TextLaws.tokenBurstiness(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expect)
    // Var >= mean*(1-mean) is the integer-count floor; in Fano units
    // that is 1-mean > -mean, so anything at or below -1e6 is impossible
    got.foreach { case (w, _, _, fano) =>
      assert(fano > -1000000L, s"$w Fano below the integer-count floor")
    }
  }
}
