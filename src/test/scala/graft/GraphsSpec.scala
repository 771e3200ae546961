package graft

import graft.queries.Graphs
import org.apache.spark.sql.functions._

/** HITS and SSSP contracts: both iterations re-run sequentially
  * in-JVM with the identical integer quantization and must agree
  * exactly. Cross-engine hashes live under the DuckDB gate.
  */
class GraphsSpec extends SparkSuite {

  private lazy val edges: Seq[(Long, Long)] =
    graft.core.Tables.lineitem(spark, sfDir)
      .join(graft.core.Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("graph_hits equals the sequential integer-quantized HITS iteration") {
    val byUser = edges.groupBy(_._1).map { case (u, es) => u -> es.map(_._2) }
    val byPart = edges.groupBy(_._2).map { case (p, es) => p -> es.map(_._1) }
    var h = byUser.keys.map(_ -> 1000000L).toMap
    var a = Map.empty[Long, Long]
    for (_ <- 1 to Graphs.HitsRounds) {
      val araw = byPart.map { case (p, us) => p -> us.map(h).sum }
      val amax = araw.values.max
      a = araw.map { case (p, v) => p -> v * 1000000L / amax }
      val hraw = byUser.map { case (u, ps) => u -> ps.map(a).sum }
      val hmax = hraw.values.max
      h = hraw.map { case (u, v) => u -> v * 1000000L / hmax }
    }
    def top(m: Map[Long, Long]) =
      m.toSeq.sortBy { case (id, sc) => (-sc, id) }.take(Graphs.HitsK)
        .zipWithIndex.map { case ((id, sc), i) => (id, sc, (i + 1).toLong) }
    val got = Graphs.graphHits(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val gotA = got.filter(_._1 == "authority").map(t => (t._2, t._3, t._4)).sortBy(_._3).toSeq
    val gotH = got.filter(_._1 == "hub").map(t => (t._2, t._3, t._4)).sortBy(_._3).toSeq
    assert(gotA == top(a), s"authorities\n got $gotA\n exp ${top(a)}")
    assert(gotH == top(h), s"hubs\n got $gotH\n exp ${top(h)}")
    // normalization invariant: the round winner holds exactly 1e6 micro
    assert(gotA.head._2 == 1000000L && gotH.head._2 == 1000000L)
  }

  test("graph_sssp equals truncated sequential Bellman-Ford on micro weights") {
    val items = graft.core.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val co = items.groupBy(_._1).values.flatMap { es =>
      val ps = es.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }.groupBy(identity).collect { case ((x, y), g) if g.size >= 2 =>
      (x, y, 1000000L / g.size)
    }.toSeq
    val sym = co ++ co.map { case (x, y, w) => (y, x, w) }
    // source = max out-degree, ties to the smallest id (the operator's
    // contract — a min-id source landed in 2-node components)
    val src = sym.groupBy(_._1).toSeq
      .map { case (n, es) => (n, es.size) }
      .minBy { case (n, deg) => (-deg, n) }._1
    var dist = Map(src -> 0L)
    for (_ <- 1 to Graphs.SsspRounds) {
      val relaxed = sym.flatMap { case (u, v, w) =>
        dist.get(u).map(du => v -> (du + w)) }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1)
        .map { case (n, ds) => n -> ds.map(_._2).min }
    }
    val got = Graphs.graphSssp(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == dist, s"size got ${got.size} exp ${dist.size}")
    assert(got(src) == 0L)
  }

  test("graph_ppr equals the sequential restart walk; mass conserved") {
    // rebuild the unweighted symmetric co-purchase graph
    val items = graft.core.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // .iterator before .collect is load-bearing: Map.collect with a
    // 2-tuple-producing partial function rebuilds a MAP, collapsing
    // every pair sharing a first element into one entry
    val und = items.groupBy(_._1).values.flatMap { es =>
      val ps = es.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).iterator.collect { case (e, g) if g.size >= 2 => e }.toSeq
    val sym = und ++ und.map(_.swap)
    val out = sym.groupBy(_._1).map { case (n, es) => n -> es.map(_._2) }
    val seed = out.toSeq.map { case (n, vs) => (n, vs.size) }
      .minBy { case (n, dg) => (-dg, n) }._1
    // int64 nano chain — EXACTLY the distributed arithmetic (integer
    // sums are order-independent, so no accumulation-order caveat)
    var r = Map(seed -> Graphs.PprNano)
    for (_ <- 1 to Graphs.PprRounds) {
      val in = scala.collection.mutable.Map.empty[Long, Long]
      r.foreach { case (u, ru) =>
        val vs = out(u)
        vs.foreach { v => in(v) = in.getOrElse(v, 0L) + ru / vs.size }
      }
      r = (in.keySet + seed).iterator.map { n =>
        n -> ((if (n == seed) Graphs.PprTeleNano else 0L)
          + in.getOrElse(n, 0L) * 85L / 100L)
      }.toMap
    }
    val got = Graphs.graphPpr(spark, sfDir).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toMap
    val exp = r.filter(_._2 > 0)
    assert(got == exp,
      s"rank maps differ: got ${got.size} exp ${exp.size}")
    // restart walk conserves mass on a dangling-free graph, up to
    // integer truncation (each edge/damp division loses < 1 nano per
    // round — bounded well under 0.1% of the unit mass here)
    assert(r.values.sum <= Graphs.PprNano)
    assert(r.values.sum > Graphs.PprNano * 999L / 1000L)
    // the seed dominates its own neighborhood
    assert(got(seed) == got.values.max)
  }

  test("graph_closeness equals the sequential multi-source BFS recompute") {
    val items = graft.core.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val co = items.groupBy(_._1).values.flatMap { es =>
      val ps = es.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }.groupBy(identity).toSeq // toSeq BEFORE collect: a Map.collect
      // yielding 2-tuples would rebuild a Map and collapse pa keys
      .collect { case ((x, y), g) if g.size >= 2 => (x, y) }
    val sym = co ++ co.map { case (x, y) => (y, x) }
    val adj = sym.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val nNodes = sym.flatMap(e => Seq(e._1, e._2)).distinct.size.toLong
    val seeds = sym.groupBy(_._1).toSeq
      .map { case (n, es) => (n, es.size) }
      .sortBy { case (n, deg) => (-deg, n) }
      .take(Graphs.ClosenessSeeds).map(_._1)
    val exp = seeds.map { s0 =>
      var dist = Map(s0 -> 0L)
      for (_ <- 1 to Graphs.ClosenessRounds) {
        val relaxed = dist.toSeq.flatMap { case (u, du) =>
          adj.getOrElse(u, Seq.empty).map(v => v -> (du + 1L)) }
        dist = (dist.toSeq ++ relaxed).groupBy(_._1)
          .map { case (n, ds) => n -> ds.map(_._2).min }
      }
      val r = dist.size.toLong
      val sd = dist.values.sum
      val cc = if (sd == 0) 0L
        else math.floor(((r - 1) * (r - 1)).toDouble * 1e6
          / ((nNodes - 1) * sd) + 0.5).toLong
      s0 -> (r, sd, cc)
    }.toMap
    val got = Graphs.graphCloseness(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == exp, s"seeds got ${got.keySet} exp ${exp.keySet}")
    // hub sanity: every seed reaches beyond itself at this SF
    got.values.foreach { case (r, _, cc) => assert(r > 1 && cc > 0) }
  }
}
