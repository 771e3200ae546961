package graft

import graft.queries.Coreset
import org.apache.spark.sql.functions._

/** k-center contracts: the distributed greedy equals a sequential
  * farthest-point traversal on the same quantized cells, and the
  * radius sequence is non-increasing (the Gonzalez invariant).
  * Cross-engine hashes live under the DuckDB gate.
  */
class CoresetSpec extends SparkSuite {

  private def qvecs(): Map[Long, Array[Long]] = {
    val vecs = graft.core.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val dim = vecs.values.map(_.length).max
    val lo = (0 until dim).map(i => vecs.values.map(_(i)).min)
    val hi = (0 until dim).map(i => vecs.values.map(_(i)).max)
    vecs.map { case (id, v) =>
      id -> v.indices.map { i =>
        if (hi(i) > lo(i))
          math.floor((v(i) - lo(i)) / (hi(i) - lo(i)) * 255 + 0.5).toLong - 128
        else 0L
      }.toArray
    }
  }

  test("sample_kcenter equals sequential farthest-point traversal") {
    val q = qvecs()
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    var picks = Vector((q.keys.min, 0L))
    var dmin = q.map { case (id, v) => id -> d2(v, q(picks.head._1)) }
    for (_ <- 2 to Coreset.KCenters) {
      val (id, rad) = dmin.toSeq.minBy { case (i, dd) => (-dd, i) }
      picks :+= (id, rad)
      dmin = dmin.map { case (i, dd) => i -> math.min(dd, d2(q(i), q(id))) }
    }
    val got = Coreset.sampleKcenter(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.length == Coreset.KCenters)
    got.zip(picks).zipWithIndex.foreach { case (((rk, id, rad), (eid, erad)), i) =>
      assert(rk == i + 1)
      assert(id == eid, s"pick $rk: $id vs $eid")
      assert(rad == erad, s"radius $rk: $rad vs $erad")
    }
    // Gonzalez invariant: coverage radius never increases
    val radii = got.drop(1).map(_._3).toSeq
    radii.zip(radii.tail).foreach { case (a, b) =>
      assert(b <= a, s"radius increased: $a -> $b") }
    // picks are distinct points
    assert(got.map(_._2).distinct.length == got.length)
  }
}
