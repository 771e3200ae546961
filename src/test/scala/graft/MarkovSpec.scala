package graft

import graft.queries.Markov
import org.apache.spark.sql.functions._

/** Markov-attribution contracts: the transition cells and truncated
  * absorption are re-derived sequentially from raw events with the
  * identical integer quantization, plus model invariants (removal
  * effects nonnegative, shares sum to ~1e6, base mass conserved).
  * Cross-engine hashes live under the DuckDB gate.
  */
class MarkovSpec extends SparkSuite {

  private def journeys: Seq[Seq[String]] = {
    val ev = graft.core.Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    ev.groupBy(_._1).values.map { es =>
      val ordered = es.sortBy(e => (e._2, e._3)).map(_._4).toSeq
      val cut = ordered.indexOf("purchase")
      val pre = if (cut >= 0) ordered.take(cut + 1) else ordered
      pre.map(t => if (t == "purchase") "C" else t)
    }.toSeq
  }

  private def refCells: Map[(String, String), Long] = {
    val steps = journeys.flatMap { j =>
      val walk = ("S" +: j).sliding(2).map { case Seq(a, b) => (a, b) }.toSeq
      val ends = if (j.last != "C") Seq((j.last, "N")) else Nil
      walk ++ ends
    }
    steps.groupBy(identity).map { case (k, g) => k -> g.size.toLong }
  }

  private def absorbRef(t: Map[(String, String), Long]): Long = {
    var p = Map("S" -> 1000000000L)
    for (_ <- 1 to Markov.MarkovSteps) {
      val inflow = t.toSeq.flatMap { case ((src, dst), tm) =>
        p.get(src).map(ps => dst -> ps * tm / 1000000L) }
      val keep = p.toSeq.filter { case (k, _) => k == "C" || k == "N" }
      p = (inflow ++ keep).groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    }
    p.getOrElse("C", 0L)
  }

  test("attribution_markov matches the sequential removal-effect model") {
    val cells = refCells
    val rowSum = cells.groupBy(_._1._1).map { case (s2, cs) => s2 -> cs.values.sum }
    val t = cells.map { case ((a, b), c) => (a, b) -> c * 1000000L / rowSum(a) }
    val base = absorbRef(t)
    assert(base > 0, "journeys must convert at this SF")
    val expected = Markov.Channels.map { ch =>
      val tx = t.toSeq.map { case ((a, b), tm) => (a, if (b == ch) "N" else b) -> tm }
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
      val cx = absorbRef(tx)
      (ch, base, cx, 1000000L - cx * 1000000L / base)
    }
    val totRem = expected.map(_._4).sum
    val got = Markov.attributionMarkov(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1).toSeq
    val exp = expected.map { case (ch, b, cx, re) =>
      (ch, b, cx, re, if (totRem == 0) 0L else re * 1000000L / totRem)
    }.sortBy(_._1)
    assert(got == exp, s"\n got $got\n exp $exp")
    // invariants: removal effects in [0, 1e6], shares sum to ≤ 1e6
    got.foreach { case (_, _, cx, re, sh) =>
      assert(re >= 0L && re <= 1000000L)
      assert(cx <= base)
      assert(sh >= 0L)
    }
    val shares = got.map(_._5).sum
    assert(shares <= 1000000L && shares > 1000000L - got.length * 2)
  }

  test("truncated absorption conserves start mass across C, N and transient") {
    val cells = refCells
    val rowSum = cells.groupBy(_._1._1).map { case (s2, cs) => s2 -> cs.values.sum }
    val t = cells.map { case ((a, b), c) => (a, b) -> c * 1000000L / rowSum(a) }
    var p = Map("S" -> 1000000000L)
    for (_ <- 1 to Markov.MarkovSteps) {
      val inflow = t.toSeq.flatMap { case ((src, dst), tm) =>
        p.get(src).map(ps => dst -> ps * tm / 1000000L) }
      val keep = p.toSeq.filter { case (k, _) => k == "C" || k == "N" }
      p = (inflow ++ keep).groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    }
    val total = p.values.sum
    // mass only leaks through floor quantization: ≤ |states| nano per step
    assert(total <= 1000000000L)
    assert(total > 1000000000L - Markov.MarkovSteps * 10L * 1000L,
      s"excessive quantization leak: $total")
  }

  test("journey_stationary equals the sequential power iteration") {
    val ev = graft.core.Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val cells = ev.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val seq = es.sortBy(e => (e._2, e._3)).map(_._4)
      seq.zip(seq.drop(1))
    }.groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val rowSum = cells.groupBy(_._1._1).map { case (s0, cs) => s0 -> cs.values.sum }
    val t = cells.map { case ((a, b), c) => (a, b) -> c * 1000000L / rowSum(a) }
    val states = (cells.keys.map(_._1) ++ cells.keys.map(_._2)).toSeq.distinct.sorted
    val p0 = 1000000000L / states.length
    var p = states.map(_ -> p0).toMap
    for (_ <- 1 to Markov.MarkovSteps) {
      p = t.toSeq.flatMap { case ((src, dst), tm) =>
        p.get(src).map(ps => dst -> ps * tm / 1000000L)
      }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    }
    val got = Markov.journeyStationary(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == states.toSet)
    states.foreach { st =>
      assert(got(st) == ((p0, p.getOrElse(st, 0L))), s"state $st")
    }
    // total stationary mass stays within flooring loss of the start mass
    val tot = p.values.sum
    assert(tot <= 1000000000L && tot > 900000000L, s"mass $tot")
  }
}
