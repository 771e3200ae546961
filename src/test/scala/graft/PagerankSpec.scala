package graft

import org.apache.spark.sql.functions._
import graft.queries.Cluster

/** PageRank vs a local power-iteration model: same formula (damping,
  * uniform dangling redistribution), so distributed and local ranks
  * must agree to float tolerance on any graph.
  */
class PagerankSpec extends SparkSuite {
  import spark.implicits._

  /** Local reference: identical update rule to Cluster.pagerankOf. */
  private def localPagerank(edges: Seq[(Long, Long)], iters: Int = 10,
      d: Double = 0.85): Map[Long, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size.toDouble
    val out = edges.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val in = edges.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    var rank = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val dmass = nodes.filterNot(out.contains).map(rank).sum
      rank = nodes.map { v =>
        val inSum = in.getOrElse(v, Nil).map(u => rank(u) / out(u)).sum
        v -> ((1 - d) / n + d * dmass / n + d * inSum)
      }.toMap
    }
    rank
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Double] =
    Cluster.pagerankOf(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("matches local power iteration on a directed graph with a dangling node") {
    // 4 -> dangling (no out-edges); classic asymmetric shape
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (2L, 4L))
    val got = run(edges)
    val want = localPagerank(edges)
    assert(got.keySet === want.keySet)
    got.foreach { case (v, r) =>
      assert(math.abs(r - want(v)) < 1e-9, s"node $v: $r vs ${want(v)}")
    }
    // rank mass is conserved (sums to 1 up to float error)
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
    // the sink-fed hub 3 outranks the pure source 4
    assert(got(3L) > got(4L))
  }

  test("symmetric clique ranks uniformly; star hub outranks spokes") {
    val clique = for {
      a <- 1L to 4L; b <- 1L to 4L if a != b
    } yield (a, b)
    val gotClique = run(clique)
    gotClique.values.foreach(r => assert(math.abs(r - 0.25) < 1e-9))
    val star = Seq((10L, 11L), (11L, 10L), (10L, 12L), (12L, 10L), (10L, 13L), (13L, 10L))
    val gotStar = run(star)
    assert(gotStar(10L) > gotStar(11L))
    val want = localPagerank(star)
    gotStar.foreach { case (v, r) => assert(math.abs(r - want(v)) < 1e-9) }
  }

  test("registered pagerank ranks the sf0.001 near-dup graph deterministically") {
    val a = Cluster.pagerank(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a.nonEmpty)
    val b = Cluster.pagerank(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a === b) // 6-decimal rounding absorbs reassociation wobble
  }
}
