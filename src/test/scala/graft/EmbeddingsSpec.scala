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

  private def referenceDeflated(m: Array[Array[Double]], k: Int, iters: Int): Seq[Array[Double]] = {
    val dim = m.head.length
    val comps = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    def ortho(x: Array[Double]): Unit = comps.foreach { u =>
      val p = (0 until dim).map(i => x(i) * u(i)).sum
      (0 until dim).foreach(i => x(i) -= p * u(i))
    }
    for (c <- 0 until math.min(k, dim)) {
      var v =
        if (c == 0) Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
        else {
          val r = new java.util.Random(c.toLong)
          val g = Array.fill(dim)(r.nextGaussian())
          ortho(g)
          val n = math.sqrt(g.map(x => x * x).sum)
          g.map(_ / n)
        }
      for (_ <- 1 to iters) {
        val raw = new Array[Double](dim)
        m.foreach { row =>
          var s = 0.0; var i = 0
          while (i < dim) { s += row(i) * v(i); i += 1 }
          var j = 0
          while (j < dim) { raw(j) += s * row(j); j += 1 }
        }
        ortho(raw)
        val nrm = math.sqrt(raw.map(x => x * x).sum)
        val sign = raw.find(math.abs(_) > 1e-9).map(math.signum).getOrElse(1.0)
        if (nrm > 0) v = raw.map(_ / nrm * sign)
      }
      comps += v
    }
    comps.toSeq
  }

  test("pca_topk ≡ sequential deflated power iteration; components pairwise orthogonal") {
    val k = Embeddings.PcaK
    val want = referenceDeflated(mat, k, Embeddings.PcaIters)
    val got = Embeddings.pcaTopk(spark, sfDir).collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1).toInt) -> r.getDouble(2)).toMap
    val dim = mat.head.length
    assert(got.size === k * dim)
    want.zipWithIndex.foreach { case (u, c) =>
      u.zipWithIndex.foreach { case (w, i) =>
        assert(math.abs(got((c, i)) - w) < 1e-6, s"comp $c dim $i: got ${got((c, i))} want $w")
      }
    }
    // orthonormal within rounding: |u_i·u_j| tiny, |u_i| ≈ 1
    val comps = (0 until k).map(c => (0 until dim).map(i => got((c, i))).toArray)
    for (a <- 0 until k; b <- 0 until k) {
      val d = (0 until dim).map(i => comps(a)(i) * comps(b)(i)).sum
      if (a == b) assert(math.abs(d - 1.0) < 1e-4, s"comp $a not unit: $d")
      else assert(math.abs(d) < 1e-4, s"comps $a,$b not orthogonal: $d")
    }
  }

  test("pca_topk recovers the planted axes of an anisotropic cloud in variance order") {
    import spark.implicits._
    // variance 25 on e1, 4 on e2, 1 on e3, 0 on e4
    val rows = (0 until 240).map { i =>
      Seq(5.0 * ((i % 21) - 10) / 10.0, 2.0 * ((i % 13) - 6) / 6.0,
        1.0 * ((i % 7) - 3) / 3.0, 0.0)
    }
    val comps = Embeddings.pcaTopkOn(rows.toDF("embedding"), k = 3, iters = 30)
      .collect().map(r => (r.getLong(0).toInt, r.getLong(1).toInt) -> r.getDouble(2)).toMap
    assert(math.abs(comps((0, 0))) > 0.99, s"comp0 should be e1: $comps")
    assert(math.abs(comps((1, 1))) > 0.99, s"comp1 should be e2: $comps")
    assert(math.abs(comps((2, 2))) > 0.99, s"comp2 should be e3: $comps")
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

  test("embed_quantize: q in [-128,127], per-dim extremes hit the rails, map-only plan") {
    val df = Embeddings.embedQuantize(spark, sfDir)
    val rows = df.collect().map(r => (r.getLong(1).toInt, r.getInt(2)))
    assert(rows.length === mat.length * mat.head.length)
    assert(rows.forall { case (_, q) => q >= -128 && q <= 127 })
    val byDim = rows.groupBy(_._1)
    byDim.values.foreach { qs =>
      val vals = qs.map(_._2)
      // a non-constant dimension must span the full rail-to-rail range
      if (vals.distinct.length > 1)
        assert(vals.min === -128 && vals.max === 127, s"rails: ${vals.min}..${vals.max}")
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"quantize must be map-only:\n$plan")
  }

  test("embed_project ≡ driver-side projection onto the deflated components at 1e-6") {
    val k = 3
    val comps = referenceDeflated(mat, k, Embeddings.PcaIters)
    val got = Embeddings.embedProjectOn(
      Tables.embeddings(spark, sfDir), k, Embeddings.PcaIters)
      .collect().map(r => (r.getLong(0), r.getLong(1).toInt) -> r.getDouble(2)).toMap
    assert(got.size === mat.length * k)
    // check every vector against the reference dot product
    val vecRows = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    vecRows.foreach { case (id, v) =>
      comps.zipWithIndex.foreach { case (u, c) =>
        val want = v.zip(u).map { case (a, b) => a * b }.sum
        assert(math.abs(got((id, c)) - want) < 1e-6, s"vec $id comp $c")
      }
    }
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
