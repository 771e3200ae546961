package graft

import graft.queries.Bayes

/** Naive-Bayes contracts: the trained log-prob table matches manual
  * add-one smoothing over the token counts, prediction equals the
  * manual posterior argmax, and the model recovers lang labels far
  * better than the majority class. Cross-engine hashes live under the
  * DuckDB gate.
  */
class BayesSpec extends SparkSuite {

  private val M = 1000000L

  private def docs() = graft.core.Tables.documents(spark, sfDir)
    .select("doc_id", "lang", "text").collect()
    .map(r => (r.getLong(0), r.getString(1),
      "[^\\p{L}]+".r.split(r.getString(2)).filter(_.nonEmpty).toSeq))

  test("nb_train matches manual add-one smoothing") {
    val ds = docs()
    val counts = ds.flatMap { case (_, lg, ts) => ts.map((lg, _)) }
      .groupBy(identity).map { case (k, g) => k -> g.length.toLong }
    val nC = counts.groupBy(_._1._1).map { case (lg, m) => lg -> m.values.sum }
    val v = counts.keys.map(_._2).toSet.size.toLong
    val got = Bayes.nbTrain(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.size == counts.size)
    counts.foreach { case ((lg, tk), c) =>
      val (gc, glp) = got((lg, tk))
      assert(gc == c)
      val exp = math.floor(
        math.log((c + 1).toDouble / (nC(lg) + v)) * M + 0.5).toLong
      assert(glp == exp, s"logp($lg,$tk)")
    }
  }

  test("nb_predict equals the manual posterior argmax and beats majority") {
    val ds = docs()
    val counts = ds.flatMap { case (_, lg, ts) => ts.map((lg, _)) }
      .groupBy(identity).map { case (k, g) => k -> g.length.toLong }
    val nC = counts.groupBy(_._1._1).map { case (lg, m) => lg -> m.values.sum }
    val v = counts.keys.map(_._2).toSet.size.toLong
    val nDocs = ds.length.toLong
    val clsDocs = ds.groupBy(_._2).map { case (lg, g) => lg -> g.length.toLong }
    val classes = clsDocs.keys.toSeq.sorted
    val prior = classes.map(lg => lg ->
      math.floor(math.log(clsDocs(lg).toDouble / nDocs) * M + 0.5).toLong).toMap
    val dflt = classes.map(lg => lg ->
      math.floor(math.log(1.0 / (nC(lg) + v)) * M + 0.5).toLong).toMap
    def logp(lg: String, tk: String): Long = counts.get((lg, tk))
      .map(c => math.floor(
        math.log((c + 1).toDouble / (nC(lg) + v)) * M + 0.5).toLong)
      .getOrElse(dflt(lg))
    val got = Bayes.nbPredict(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2), r.getLong(3)))
      .toMap
    assert(got.size == ds.length)
    var correct = 0L
    ds.foreach { case (id, lg, ts) =>
      val scores = classes.map(c => c -> (prior(c) + ts.map(logp(c, _)).sum))
      val (bestC, bestS) = scores.minBy { case (c, sc) => (-sc, c) }
      val (actual, pred, score) = got(id)
      assert(actual == lg)
      assert(pred == bestC, s"doc $id: $pred vs $bestC")
      assert(score == bestS, s"doc $id score")
      if (pred == lg) correct += 1
    }
    val majority = clsDocs.values.max
    assert(correct > majority, s"NB accuracy $correct <= majority $majority")
  }
}
