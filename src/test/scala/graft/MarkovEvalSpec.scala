package graft

import graft.queries.EventOps

/** markov_eval contracts: equals a sequential train/predict/score
  * replay over the same chronological split; accuracy beats the
  * 1/|types| uniform-guess floor in aggregate only if the journey
  * has structure — on this synthetic stream types are near-uniform,
  * so the pinned contract is the replay plus internal consistency.
  */
class MarkovEvalSpec extends SparkSuite {

  test("markov_eval equals the sequential replay") {
    val evs = graft.core.Tables.events(spark, sfDir)
      .selectExpr("user_id", "ts", "event_id", "event_type",
        "ts DIV 86400000000000 AS day").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))
    val steps = evs.groupBy(_._1).values.flatMap { rows =>
      rows.sortBy(t => (t._2, t._3)).sliding(2).collect {
        case Array(a, b) => (a._4, b._4, b._5)
      }
    }.toSeq
    val split = EventOps.MarkovSplitDay
    val train = steps.filter(_._3 < split).groupBy(t => (t._1, t._2)).view
      .mapValues(_.size.toLong).toMap
    val pred = train.keys.map(_._1).toSeq.distinct.map { p =>
      p -> train.filter(_._1._1 == p).toSeq
        .map { case ((_, nx), n) => (nx, n) }
        .sortBy { case (nx, n) => (-n, nx) }.head._1
    }.toMap
    val test = steps.filter(_._3 >= split).groupBy(t => (t._1, t._2)).view
      .mapValues(_.size.toLong).toMap
    val expect = test.keys.map(_._1).toSeq.distinct
      .filter(pred.contains).map { p =>
      val nTest = test.filter(_._1._1 == p).values.sum
      val nCorrect = test.getOrElse((p, pred(p)), 0L)
      p -> (pred(p), nTest, nCorrect, nCorrect * 1000000L / nTest)
    }.toMap
    val got = EventOps.markovEval(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == expect)
    assert(expect.nonEmpty)
    got.values.foreach { case (_, nt, nc, acc) =>
      assert(nc <= nt && acc <= 1000000L)
    }
  }
}
