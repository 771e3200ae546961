package graft

import graft.queries.Knn

/** kNN contracts: classification and mutual-NN mining equal a
  * sequential reference with the identical IEEE cosine chain
  * (dot accumulated left-to-right, dot/(nrmA*nrmB)), the same
  * (cos DESC, id ASC) ranking and integer vote/margin folds.
  */
class KnnSpec extends SparkSuite {

  private def vecs(): Array[(Long, Long, Array[Double])] =
    graft.core.Tables.embeddings(spark, sfDir)
      .selectExpr("vec_id", "CAST(label AS BIGINT)",
        "CAST(embedding AS ARRAY<DOUBLE>)").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Double](2).toArray))

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }

  test("knn_classify equals the sequential majority-vote reference") {
    val all = vecs().map { case (id, l, v) => (id, l, v, math.sqrt(dot(v, v))) }
    val expect = all.filter(_._1 % 10 == 0).map { case (qid, ql, qv, qn) =>
      val top = all.filter(_._1 % 10 != 0)
        .map { case (id, l, v, n) => (id, l, dot(v, qv) / (n * qn)) }
        .sortBy { case (id, _, c) => (-c, id) }.take(7)
      val (predLabel, votes) = top.groupBy(_._2).view
        .mapValues(_.length).toSeq
        .sortBy { case (l, n) => (-n, l) }.head
      qid -> (ql, predLabel, votes.toLong, if (predLabel == ql) 1L else 0L)
    }.toMap
    val got = Knn.knnClassify(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got == expect)
    assert(expect.nonEmpty)
    // structural sanity: a majority vote is 1..k and the winner's
    // vote count is consistent (labels in this synthetic table are
    // NOT cluster-aligned, so no accuracy floor is asserted — the
    // operator contract is the vote, not the corpus)
    assert(expect.values.forall { case (_, _, v, _) => v >= 1L && v <= 7L })
  }

  test("mnn_pairs equals the sequential mutual-top1 margin reference") {
    val all = vecs().map { case (id, _, v) => (id, v, math.sqrt(dot(v, v))) }
    val as = all.filter(_._1 % 2 == 0)
    val bs = all.filter(_._1 % 2 == 1)
    def cq(x: (Long, Array[Double], Double), y: (Long, Array[Double], Double)): Long =
      math.floor(dot(x._2, y._2) / (x._3 * y._3) * 1000000 + 0.5).toLong
    def top(side: Seq[(Long, Array[Double], Double)],
            other: Seq[(Long, Array[Double], Double)]) =
      side.map { x =>
        val ranked = other.map(y => (y._1, cq(x, y)))
          .sortBy { case (id, c) => (-c, id) }.take(4)
        x._1 -> (ranked.head._1,
          3 * ranked.head._2 - ranked.tail.map(_._2).sum)
      }.toMap
    val fwd = top(as.toSeq, bs.toSeq)
    val bwd = top(bs.toSeq, as.toSeq)
    val expect = fwd.flatMap { case (a, (b, fm)) =>
      bwd.get(b).collect { case (`a`, bm) => (a, b) -> (fm, bm) }
    }
    val got = Knn.mnnPairs(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == expect)
    assert(expect.nonEmpty, "no mutual pairs — divide too adversarial?")
  }
}
