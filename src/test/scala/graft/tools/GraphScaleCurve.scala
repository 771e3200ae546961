package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Checkpoints.StableOps
import graft.queries.{Cluster, Graphs}

/** Scale-curve evidence for the GRAPH family: per-stage row counts on
  * the sf0.1 co-purchase graph and a ×10 replication (10 DISJOINT
  * copies — node ids offset per copy, so |V| and |E| grow exactly
  * 10× with the same degree structure). Two cost laws measured side
  * by side:
  *
  *  - GLOBAL PageRank (Cluster.pagerankOf): every round joins the
  *    full edge list against the full rank frame — cost tracks |E|,
  *    so the ×10 graph pays ~10× per round. That is the honest price
  *    of a global centrality, and the curve records it.
  *  - PERSONALIZED PageRank (graph_ppr's round arithmetic, seeded at
  *    the max-degree node): the rank frame holds only REACHED nodes,
  *    and a restart walk is LOCAL to its seed's component — so the
  *    per-round frontier |E ⋉ reached| is IDENTICAL at ×1 and ×10.
  *    Query-conditioned relevance costs the neighborhood, not the
  *    corpus: the billion-node serving claim, measured.
  *
  * Usage: Test/runMain graft.tools.GraphScaleCurve [sfDir]
  */
object GraphScaleCurve {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = ScaleTools.session()

    val base = Graphs.weightedEdges(spark, sfDir).select("src", "dst")

    def scaled(copies: Int): DataFrame =
      (0 until copies).map { k =>
        if (k == 0) base
        else base.select((col("src") + lit(k * 10000000L)).as("src"),
          (col("dst") + lit(k * 10000000L)).as("dst"))
      }.reduce(_ unionAll _)

    def run(tag: String, edges: DataFrame): Unit = {
      val e = edges.repartition(col("src")).stable
      val nE = e.count()
      val nV = e.select(col("src").as("n"))
        .union(e.select(col("dst").as("n"))).distinct().count()

      // global pagerank: full |E|-join rounds, |V|-row result
      var t0 = System.nanoTime()
      val pr = Cluster.pagerankOf(e)
      val nRank = pr.count()
      val tPr = (System.nanoTime() - t0) / 1e9

      // personalized pagerank: frontier-bounded rounds — THE
      // registered graph_ppr arithmetic (Graphs.pprRoundsOn is the
      // shared loop), with the census hook counting |E ⋉ reached_i|
      t0 = System.nanoTime()
      val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
      val ann = e.join(deg, "src").repartition(col("src")).stable
      val seed = deg.orderBy(col("outdeg").desc, col("src").asc).limit(1)
        .select(col("src").as("node")).stable
      val frontier = scala.collection.mutable.ArrayBuffer.empty[Long]
      // Persist each round's frontier join BEFORE the census count:
      // counting the unpersisted join would execute it a second time
      // when the round's contrib aggregation materializes downstream,
      // overstating ppr_wall vs. the census-free graph_ppr arithmetic
      // this curve exists to measure. Freed after the run (bounded:
      // ≤ PprRounds cached frontier joins, each |E ⋉ reached| rows).
      val censusJoins = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
      val r = Graphs.pprRoundsOn(ann, seed, { j =>
        val cached = j.persist()
        censusJoins += cached
        frontier += cached.count()
      })
      val nReached = r.filter(col("rank_nano") > 0).count()
      val tPpr = (System.nanoTime() - t0) / 1e9
      censusJoins.foreach(_.unpersist(false))
      r.unpersist(false); ann.unpersist(false); e.unpersist(false)

      println(f"[graph-scale] $tag V=$nV E=$nE pagerank_rows=$nRank " +
        f"pr_wall=$tPr%.2f s ppr_frontier=${frontier.mkString(",")} " +
        f"ppr_reached=$nReached ppr_wall=$tPpr%.2f s")
    }

    run("x1 ", scaled(1))
    run("x10", scaled(10))
    spark.stop()
  }
}
