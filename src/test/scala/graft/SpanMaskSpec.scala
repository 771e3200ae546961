package graft

import graft.queries.SpanMask

/** Span-corruption contracts: the (input, target) pair must be
  * LOSSLESS — substituting each sentinel's target span back into the
  * input reconstructs the original token stream — and the selection
  * rate must track the 1-in-4 design.
  */
class SpanMaskSpec extends SparkSuite {

  private lazy val rows = SpanMask.maskSpans(spark, sfDir).collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))

  private lazy val original: Map[Long, Array[String]] =
    graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).split("[^\\p{L}]+").filter(_.nonEmpty)).toMap

  test("sentinel substitution reconstructs the original document") {
    assert(rows.nonEmpty)
    rows.foreach { case (id, nMasked, input, target) =>
      // parse target: "<X_1> a b <X_2> c d" → k -> tokens
      val spans = if (target.isEmpty) Map.empty[Int, Seq[String]] else {
        val parts = target.split("<X_").filter(_.nonEmpty)
        parts.map { p =>
          val Array(k, rest) = p.split(">", 2)
          k.toInt -> rest.trim.split(" ").toSeq
        }.toMap
      }
      assert(spans.size.toLong === nMasked)
      val rebuilt = input.split(" ").filter(_.nonEmpty).flatMap { tok =>
        if (tok.startsWith("<X_")) spans(tok.stripPrefix("<X_").stripSuffix(">").toInt)
        else Seq(tok)
      }
      assert(rebuilt.toSeq === original(id).toSeq, s"doc $id not lossless")
    }
  }

  test("sentinels are consecutively numbered and ordered in the input") {
    rows.filter(_._2 > 0).foreach { case (id, nMasked, input, _) =>
      val ks = input.split(" ").filter(_.startsWith("<X_"))
        .map(_.stripPrefix("<X_").stripSuffix(">").toInt)
      assert(ks.toSeq === (1 to nMasked.toInt).toSeq, s"doc $id sentinels $ks")
    }
  }

  test("selection rate tracks the 1-in-4 design") {
    val totalBlocks = original.values.map(_.length / 5).sum
    val masked = rows.map(_._2).sum
    val rate = masked.toDouble / totalBlocks
    assert(rate > 0.15 && rate < 0.35, s"mask rate $rate off design 0.25")
  }

  test("ab_test_readout: formulas agree with a sequential recompute") {
    val ev = graft.core.Tables.events(spark, sfDir)
      .select("user_id", "value").collect()
      .map(r => (r.getLong(0) % 2, r.getDouble(1)))
    def stats(arm: Long) = {
      val xs = ev.filter(_._1 == arm).map(_._2)
      (xs.length.toLong, xs.sum, xs.map(x => x * x).sum)
    }
    val (na, sa, ssa) = stats(0); val (nb, sb, ssb) = stats(1)
    val (ma, mb) = (sa / na, sb / nb)
    val va = (ssa - sa * sa / na) / (na - 1)
    val vb = (ssb - sb * sb / nb) / (nb - 1)
    val z = (mb - ma) / math.sqrt(va / na + vb / nb)
    val r = graft.queries.EventOps.abTestReadout(spark, sfDir).collect()(0)
    assert(r.getLong(0) === na && r.getLong(1) === nb)
    assert(math.abs(r.getDouble(2) - ma) < 1e-3)
    assert(math.abs(r.getDouble(5) - z) < 1e-3)
  }
}
