package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.queries.Kmeans

/** Distributed Lloyd vs a sequential reference implementation with the
  * same seeding (first k by vec_id), tie-break (smallest cell), and
  * empty-cell rule (keep previous centroid).
  */
class KmeansSpec extends SparkSuite {

  private def referenceLloyd(vecs: Seq[(Long, Array[Double])], k: Int,
      iters: Int): Map[Long, Int] = {
    val sorted = vecs.sortBy(_._1)
    var cents = sorted.take(k).map(_._2.clone()).toArray
    def nearest(v: Array[Double], cs: Array[Array[Double]]): Int = {
      var best = 0; var bestD = Double.PositiveInfinity
      var c = 0
      while (c < cs.length) {
        var d = 0.0; var i = 0
        while (i < v.length) { d += -2.0 * v(i) * cs(c)(i); i += 1 }
        var c2 = 0.0; var j = 0
        while (j < cs(c).length) { c2 += cs(c)(j) * cs(c)(j); j += 1 }
        d += c2
        if (d < bestD) { bestD = d; best = c } // strict < : ties keep lowest id
        c += 1
      }
      best
    }
    for (_ <- 1 to iters) {
      val dim = cents(0).length
      val sums = Array.fill(k, dim)(0.0)
      val counts = new Array[Long](k)
      sorted.foreach { case (_, v) =>
        val c = nearest(v, cents)
        var i = 0
        while (i < dim) { sums(c)(i) += v(i); i += 1 }
        counts(c) += 1
      }
      cents = Array.tabulate(k) { c =>
        if (counts(c) == 0) cents(c)
        else sums(c).map(_ / counts(c))
      }
    }
    sorted.map { case (id, v) => id -> nearest(v, cents) }.toMap
  }

  private lazy val raw: Seq[(Long, Array[Double])] =
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq

  test("kmeans assignments ≡ sequential Lloyd on sf0.001 embeddings") {
    val want = referenceLloyd(raw, Kmeans.K, Kmeans.Iters)
    val got = Kmeans.kmeans(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got.size === raw.size)
    assert(got === want)
    // every cell is used on this corpus (k=8 over 500 spread vectors)
    assert(got.values.toSet.size === Kmeans.K)
  }

  test("kmeans handles an empty cell by keeping its previous centroid") {
    import spark.implicits._
    // seeds are ids 0..2; id 2's seed is a far outlier that attracts
    // nothing once centroids move — including itself (it sits closer
    // to the mass after round 1's update pulls centroid 2 toward the
    // duplicate point at (0.9, 0.9))
    val pts: Seq[(Long, Seq[Double])] = Seq(
      (0L, Seq(0.0, 0.0)), (1L, Seq(0.1, 0.0)), (2L, Seq(0.9, 0.9)),
      (3L, Seq(0.05, 0.0)), (4L, Seq(0.9, 0.9)))
    val df = pts.toDF("vec_id", "v")
    val got = Kmeans.kmeansAssignOn(df, k = 3, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val want = referenceLloyd(pts.map(p => (p._1, p._2.toArray)), 3, 3)
    assert(got === want)
  }

  test("seeding works on sparse, offset vec_id spaces") {
    import spark.implicits._
    // ids 1000, 2000, ... — vec_id < k would seed zero clusters
    val pts: Seq[(Long, Seq[Double])] = (1 to 10)
      .map(i => (i * 1000L, Seq(i.toDouble, 0.0)))
    val got = Kmeans.kmeansAssignOn(pts.toDF("vec_id", "v"), k = 3, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val want = referenceLloyd(pts.map(p => (p._1, p._2.toArray)), 3, 2)
    assert(got === want)
    assert(got.values.toSet.size === 3)
  }

  test("assignment round is map-only: no Exchange above the scan in the assign stage") {
    import spark.implicits._
    val df = raw.take(50).map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "v")
    // one-round pipeline: final assignment select only (iters=0 keeps
    // seed centroids — plan shape is identical for any round)
    val out = Kmeans.kmeansAssignOn(df, k = 4, iters = 0)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"assignment stage shuffles:\n$plan")
  }

  test("driftEmbedding: complete cell grid, non-negative PSI terms, counts conserve") {
    val rows = graft.queries.Kmeans.driftEmbedding(spark, sfDir).collect()
    val assign = graft.queries.Kmeans.kmeans(spark, sfDir)
    val nCells = assign.select("cell").distinct().count()
    assert(rows.length.toLong === nCells)
    // every vector lands in exactly one (cell, snapshot) count
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum === assign.count())
    // (p_a − p_b)·ln(p_a/p_b) has matching signs — each term ≥ 0
    rows.foreach { r =>
      assert(r.getDouble(5) >= -1e-9, s"negative PSI term in $r")
      assert(r.getDouble(3) > 0 && r.getDouble(4) > 0)
    }
  }

  test("cluster_topics: ≤3 dense-ranked labels per cell, lift ratio correct, deterministic") {
    val rows = Kmeans.clusterTopics(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getDouble(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).values.foreach { g =>
      assert(g.length <= Kmeans.TopicTopN)
      assert(g.map(_._2).sorted.toSeq === (1 to g.length))
      // within a cell, rank order follows (lift desc, tok asc)
      val sorted = g.sortBy(_._2)
      sorted.sliding(2).filter(_.length == 2).foreach { p =>
        val (a, b) = (p(0), p(1))
        assert(a._4 > b._4 || (a._4 == b._4 && a._3 < b._3))
      }
    }
    assert(rows.forall(_._5 >= Kmeans.TopicMinCount))
    // reference lift for one emitted row, recomputed from raw counts
    val cells = Kmeans.kmeansAssignOn(
      graft.core.Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v")))
    val toks = graft.core.Tables.documents(spark, sfDir)
      .join(cells, col("doc_id") === col("vec_id"))
      .select(col("cell"), explode(graft.queries.Dedup.tokensCol(col("text"))).as("tok"))
      .collect().map(r => (r.getInt(0), r.getString(1)))
    val (cell0, _, tok0, lift0, c0) = rows.head
    val cIn = toks.count(t => t._1 == cell0 && t._2 == tok0).toDouble
    val nc = toks.count(_._1 == cell0).toDouble
    val cg = toks.count(_._2 == tok0).toDouble
    val n = toks.length.toDouble
    assert(c0 === cIn.toLong)
    assert(math.abs((cIn / nc) / (cg / n) - lift0) < 1e-4 + 1e-9)
    val again = Kmeans.clusterTopics(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getDouble(3), r.getLong(4)))
    assert(rows.sorted.toSeq === again.sorted.toSeq)
  }
}
