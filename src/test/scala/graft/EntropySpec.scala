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
}
