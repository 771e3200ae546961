package graft

import org.apache.spark.sql.functions._
import graft.queries.Similarity

class SimilaritySpec extends SparkSuite {

  test("annCosine: 5 ranked neighbors per query, cosine in [-1,1]") {
    val rows = Similarity.annCosine(spark, sfDir).collect()
    val byQuery = rows.groupBy(_.getLong(0))
    assert(byQuery.keySet === (0L until 8L).toSet)
    byQuery.values.foreach { ns =>
      assert(ns.map(_.getInt(2)).sorted.toSeq === Seq(1, 2, 3, 4, 5))
      assert(ns.forall(r => math.abs(r.getDouble(3)) <= 1.0))
      // ranking is by descending cosine
      val sorted = ns.sortBy(_.getInt(2)).map(_.getDouble(3))
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a >= b })
    }
  }

  test("annLsh returns a subset ranking consistent with exact cosine") {
    val exact = Similarity.annCosine(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.annLsh(spark, sfDir).collect()
    assert(lsh.nonEmpty, "LSH should find same-bucket candidates")
    // every (query, neighbor, cos) from LSH must carry the true cosine:
    // spot-check that LSH's top hit for some query appears in exact top-5
    val hits = lsh.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = hits.intersect(exact).size.toDouble / exact.size
    assert(recall > 0.0, s"LSH recall should be positive, got $recall (hits=${hits.size})")
  }

  test("annIvf: 5 neighbors per query, recall ≥ 0.6 vs exact") {
    val exact = Similarity.annCosine(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.annIvf(spark, sfDir).collect()
    assert(ivf.length === 40) // 8 queries × top-5
    val hits = ivf.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = hits.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.6, s"IVF recall $recall (probing $hits)")
  }

  test("dedupEmbedding: top-50 pairs, ordered by cosine desc, no self-pairs") {
    val rows = Similarity.dedupEmbedding(spark, sfDir).collect()
    assert(rows.length === 50)
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    val sims = rows.map(_.getDouble(2))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
  }
}
