package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.queries.Embeddings

/** Distributed power iteration vs a sequential reference with the same
  * init, round count, and sign convention; embed_stats invariants.
  */
class EmbeddingsSpec extends SparkSuite {

  private lazy val mat: Array[Array[Double]] =
    Tables.embeddings(spark, sfDir)
      .select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)

  private def referencePower(m: Array[Array[Double]], iters: Int): Array[Double] = {
    val dim = m.head.length
    var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    for (_ <- 1 to iters) {
      val raw = new Array[Double](dim)
      m.foreach { row =>
        var s = 0.0; var i = 0
        while (i < dim) { s += row(i) * v(i); i += 1 }
        var j = 0
        while (j < dim) { raw(j) += s * row(j); j += 1 }
      }
      val nrm = math.sqrt(raw.map(x => x * x).sum)
      val sign = raw.find(math.abs(_) > 1e-9).map(math.signum).getOrElse(1.0)
      v = raw.map(_ / nrm * sign)
    }
    v
  }

  test("pca_top ≡ sequential power iteration within 1e-6 per component") {
    val want = referencePower(mat, Embeddings.PcaIters)
    val got = Embeddings.pcaTop(spark, sfDir).collect()
      .map(r => r.getLong(0).toInt -> r.getDouble(1)).toMap
    assert(got.size === want.length)
    want.zipWithIndex.foreach { case (w, i) =>
      assert(math.abs(got(i) - w) < 1e-6, s"dim $i: got ${got(i)} want $w")
    }
    // unit vector (up to the 1e-6 output rounding)
    val nrm = math.sqrt(got.values.map(x => x * x).sum)
    assert(math.abs(nrm - 1.0) < 1e-4)
  }

  test("pca_top captures the dominant direction of a planted anisotropic cloud") {
    import spark.implicits._
    // points along e1 with small e2 noise: top PC ≈ e1
    val rows = (0 until 200).map { i =>
      val t = (i % 21).toDouble - 10.0
      Seq(t, 0.05 * ((i % 7).toDouble - 3.0), 0.0, 0.0)
    }
    val df = rows.toDF("embedding")
    val v = Embeddings.pcaTopOn(df, iters = 20).collect()
      .map(r => r.getLong(0).toInt -> r.getDouble(1)).toMap
    assert(math.abs(v(0)) > 0.99, s"expected e1-dominant, got $v")
    assert(math.abs(v(2)) < 1e-6 && math.abs(v(3)) < 1e-6)
  }

  test("embed_normalize: per-dim mean ~0 / sd ~1; map-only plan (no Exchange)") {
    val df = Embeddings.embedNormalize(spark, sfDir)
    val byDim = df.collect()
      .map(r => r.getLong(1).toInt -> r.getDouble(2))
      .groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2) }
    val dim = mat.head.length
    assert(byDim.size === dim)
    (0 until dim).foreach { i =>
      val xs = byDim(i)
      assert(xs.length === mat.length)
      val mean = xs.sum / xs.length
      val sd = math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum / (xs.length - 1))
      assert(math.abs(mean) < 1e-4, s"dim $i mean $mean")
      assert(math.abs(sd - 1.0) < 1e-3, s"dim $i sd $sd")
    }
    // normalization is a pure map (explode + project): never shuffles
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"normalize must be map-only:\n$plan")
  }

  test("pca_top degenerate inputs: empty corpus → empty frame; all-zero corpus → finite vector") {
    import spark.implicits._
    val empty = Seq.empty[Seq[Double]].toDF("embedding")
    assert(Embeddings.pcaTopOn(empty, iters = 3).collect().isEmpty)
    val zeros = Seq.fill(5)(Seq(0.0, 0.0, 0.0)).toDF("embedding")
    val v = Embeddings.pcaTopOn(zeros, iters = 3).collect().map(_.getDouble(1))
    assert(v.length === 3)
    assert(v.forall(x => !x.isNaN && !x.isInfinite), s"NaN leak: ${v.toSeq}")
  }

  test("embed_stats: one row per dimension, l2 mass positive, bounds ordered") {
    val rows = Embeddings.embedStats(spark, sfDir).collect()
    assert(rows.length === mat.head.length)
    rows.foreach { r =>
      assert(r.getLong(1) === mat.length.toLong)
      assert(r.getDouble(3) <= r.getDouble(2) && r.getDouble(2) <= r.getDouble(4))
      assert(r.getDouble(5) > 0.0)
    }
  }
}
