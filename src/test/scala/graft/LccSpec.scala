package graft

import org.apache.spark.sql.functions._
import graft.queries.{Cluster, Dedup}

/** graph_lcc contracts: per-node triangle counts and coefficients
  * equal a sequential recompute over the same near-dup edges, and
  * the corner sum reconciles with the global triangle census.
  */
class LccSpec extends SparkSuite {

  test("graph_lcc equals the sequential per-node triangle recompute") {
    val edges = Dedup.ngramScored(graft.core.Tables.documents(spark, sfDir))
      .filter(col("jac") >= 0.6).select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = collection.mutable.Map.empty[Long, collection.mutable.Set[Long]]
    edges.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, collection.mutable.Set.empty) += b
      adj.getOrElseUpdate(b, collection.mutable.Set.empty) += a
    }
    val tri = adj.keys.map { v =>
      val ns = adj(v).toSeq
      val t = (for {
        i <- ns.indices; j <- (i + 1) until ns.length
        if adj(ns(i)).contains(ns(j))
      } yield 1).size.toLong
      v -> t
    }.toMap
    val expect = adj.keys.map { v =>
      val d = adj(v).size.toLong
      val t = tri(v)
      val lcc = if (d >= 2) (2 * t * 1000000L) / (d * (d - 1)) else 0L
      v -> (d, t, lcc)
    }.toMap
    val got = Cluster.graphLcc(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == expect)
    assert(expect.nonEmpty)
    // corner sum = 3 × global census
    val global = Cluster.triangleCount(spark, sfDir).collect().head
      .getAs[Long]("n_triangles")
    assert(expect.values.map(_._2).sum == 3 * global)
  }
}
