package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Embedding-column analytics ([EXT]): the per-dimension health checks
  * and factor extraction an embedding pipeline runs before indexing —
  * dead/degenerate dimension detection (embed_stats) and the dominant
  * direction of the corpus (pca_top, distributed power iteration).
  *
  * Scale design: everything reduces through posexplode → groupBy(dim):
  * the shuffle carries dim-bounded aggregate cells (64 here), never
  * vectors; pca_top's per-round driver action is one dim-length
  * vector — the same bounded-collect contract as Kmeans/IVF.
  */
object Embeddings {

  private def dot(a: Column, b: Column): Column =
    graft.functions.DotProduct.dotCol(a, b)

  /** Per-dimension corpus statistics: n, mean, min, max, L2 mass —
    * the report that catches dead dimensions (all-zero), saturated
    * ones (|x| pinned), and scale drift between snapshots. One
    * posexplode + one partial-agg'd shuffle of dim cells.
    */
  def embedStats(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(posexplode(col("embedding").cast("array<double>")))
      .groupBy(col("pos").as("dim"))
      .agg(count(lit(1)).as("n"),
        round(avg("col"), 6).as("mean"),
        round(min("col"), 6).as("lo"),
        round(max("col"), 6).as("hi"),
        round(sum(col("col") * col("col")), 6).as("l2_mass"))
      .select(col("dim").cast("long").as("dim"), col("n"), col("mean"),
        col("lo"), col("hi"), col("l2_mass"))

  /** Power-iteration rounds for [[pcaTop]]. */
  val PcaIters = 10

  /** Dominant right singular vector of the (uncentered) embedding
    * matrix via distributed power iteration: per round, the map-side
    * score s = v·x uses the literal current vector (zero shuffle),
    * the update X^T s reduces through posexplode to dim cells, and
    * the driver renormalizes a dim-length vector. Sign convention:
    * first component with |w| > 1e-9 is made positive, so the result
    * is deterministic up to float-sum noise (spec tolerance 1e-6
    * against a sequential reference in EmbeddingsSpec).
    */
  /** Up to `k` orthonormal principal directions by power iteration
    * with Gram-Schmidt deflation: each round multiplies by X^T X
    * distributed (map-side score with the literal current vector →
    * posexplode → dim cells), then the DRIVER orthogonalizes the
    * dim-length update against the already-extracted components
    * (k·dim flops — bounded) and renormalizes. Component 0 starts at
    * the uniform vector (identical to the single-component form);
    * later components start from a seeded deterministic Gaussian so
    * the start is never parallel to an earlier direction. Sign
    * convention per component: first |w| > 1e-9 entry positive.
    * Degenerate input: empty corpus → no components; a zero-norm
    * update (all-zero corpus / k past the rank collapsing to 0)
    * keeps the previous iterate rather than going NaN.
    */
  def pcaComponents(embeddings: DataFrame, k: Int, iters: Int): Seq[Array[Double]] = {
    val s = embeddings.sparkSession
    graft.functions.DotProduct.register(s)
    val all = embeddings
      .select(col("embedding").cast("array<double>").as("v"))
      .persist()
    // degenerate corpus: no rows → no components, not a .first() crash
    val head = all.select(size(col("v"))).limit(1).collect()
    if (head.isEmpty) {
      all.unpersist(false)
      return Seq.empty
    }
    val dim = head(0).getInt(0)
    val comps = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    def orthogonalize(x: Array[Double]): Unit = comps.foreach { u =>
      var p = 0.0
      var i = 0
      while (i < dim) { p += x(i) * u(i); i += 1 }
      i = 0
      while (i < dim) { x(i) -= p * u(i); i += 1 }
    }
    for (c <- 0 until math.min(k, dim)) {
      var vec =
        if (c == 0) Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
        else {
          val r = new java.util.Random(c.toLong) // algorithm-specified → deterministic
          val g = Array.fill(dim)(r.nextGaussian())
          orthogonalize(g)
          val n = math.sqrt(g.map(x => x * x).sum)
          g.map(_ / n)
        }
      for (_ <- 1 to iters) {
        val vLit = array(vec.map(lit).toIndexedSeq: _*)
        val next = all
          .select(dot(col("v"), vLit).as("s"), posexplode(col("v")))
          .groupBy("pos")
          .agg(sum(col("s") * col("col")).as("w"))
          .collect() // dim rows — the bounded per-round driver action
        val raw = new Array[Double](dim)
        next.foreach(r => raw(r.getInt(0)) = r.getDouble(1))
        orthogonalize(raw)
        val nrm = math.sqrt(raw.map(x => x * x).sum)
        val sign = raw.find(math.abs(_) > 1e-9).map(x => math.signum(x)).getOrElse(1.0)
        if (nrm > 0) vec = raw.map(_ / nrm * sign)
      }
      comps += vec
    }
    all.unpersist(false)
    comps.toSeq
  }

  def pcaTopOn(embeddings: DataFrame, iters: Int = PcaIters): DataFrame = {
    val s = embeddings.sparkSession
    import s.implicits._
    val comps = pcaComponents(embeddings, k = 1, iters)
    comps.headOption.getOrElse(Array.empty[Double])
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toSeq
      .toDF("dim", "weight")
      .select(col("dim"), round(col("weight"), 6).as("weight"))
  }

  def pcaTop(s: SparkSession, d: String): DataFrame =
    pcaTopOn(Tables.embeddings(s, d))

  /** Components for [[pcaTopk]]. */
  val PcaK = 4

  /** Top-k principal directions as (component, dim, weight) scalar
    * rows. Not SQL-expressible (iterative, plan-time literals) →
    * rows-only for the driver; ≡ a sequential deflated reference and
    * pairwise-orthogonal within 1e-6 in EmbeddingsSpec.
    */
  def pcaTopkOn(embeddings: DataFrame, k: Int = PcaK, iters: Int = PcaIters): DataFrame = {
    val s = embeddings.sparkSession
    import s.implicits._
    pcaComponents(embeddings, k, iters).zipWithIndex.flatMap { case (u, c) =>
      u.zipWithIndex.map { case (w, i) => (c.toLong, i.toLong, w) }
    }.toDF("component", "dim", "weight")
      .select(col("component"), col("dim"), round(col("weight"), 6).as("weight"))
  }

  def pcaTopk(s: SparkSession, d: String): DataFrame =
    pcaTopkOn(Tables.embeddings(s, d))

  /** Per-dimension z-normalization — the feature-scaling pass before
    * indexing or clustering. The dim-bounded (mean, sd) table is
    * computed once (posexplode → dim cells, explicit sum/sumsq so both
    * engines run identical arithmetic), collected (2·dim doubles —
    * the bounded-literal pattern of Kmeans/IVF), and folded into the
    * plan as literal arrays, so the normalization itself is a pure map
    * over the corpus: no join, no second shuffle, vectors never move.
    * Zero-variance dimensions normalize to 0 by convention. Output is
    * exploded to scalar (vec_id, dim, z) rows — the registry contract
    * is hash-matchable scalar columns, and at dim=64 the row blow-up
    * is trivial next to the vectors themselves.
    */
  def embedNormalize(s: SparkSession, d: String): DataFrame = {
    val all = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val stats = all
      .select(posexplode(col("v")))
      .groupBy("pos")
      .agg(count(lit(1)).as("n"), sum("col").as("s"),
        sum(col("col") * col("col")).as("ss"))
      .select(col("pos"),
        (col("s") / col("n")).as("mean"),
        // n = 1 would divide by zero (NULL sd) — treat a single-row
        // corpus as zero-variance, same as a constant dimension
        when(col("n") > 1,
          sqrt((col("ss") - col("s") * col("s") / col("n")) / (col("n") - 1)))
          .otherwise(lit(0.0)).as("sd"))
      .collect().map(r => r.getInt(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val dim = if (stats.isEmpty) 0 else stats.keys.max + 1
    // ragged corpora can leave positions unseen — normalize those to 0
    val meanLit = array((0 until dim).map(i =>
      lit(stats.getOrElse(i, (0.0, 0.0))._1)).toIndexedSeq: _*)
    val sdLit = array((0 until dim).map(i =>
      lit(stats.getOrElse(i, (0.0, 0.0))._2)).toIndexedSeq: _*)
    all.select(col("vec_id"), posexplode(col("v")))
      .select(col("vec_id"), col("pos").cast("long").as("dim"),
        {
          val i = (col("pos") + 1).cast("int")
          val m = element_at(meanLit, i)
          val sd = element_at(sdLit, i)
          when(sd > 0, round((col("col") - m) / sd, 6))
            .otherwise(lit(0.0)).as("z")
        })
  }

  /** Int8 scalar quantization — the compression pass before an ANN
    * index ships to serving (4-8× memory cut at ~1% recall cost). The
    * dim-bounded (lo, hi) table collects once and folds into the plan
    * as literal arrays (the embedNormalize pattern), so quantization
    * is a pure map: q = floor((x-lo)/(hi-lo)·255 + 0.5) - 128 in
    * [-128, 127]. floor(t+0.5) — not round() — so both engines round
    * the same IEEE value identically; constant dimensions quantize to
    * 0. Scalar (vec_id, dim, q) rows per the registry contract.
    */
  /** Per-dimension (lo, hi) quantization rails as plan-time literal
    * arrays (dim-bounded collect — the embedNormalize pattern); None
    * on an empty corpus. Shared by [[embedQuantize]] and the
    * quantized ANN serving path ([[Similarity.annQuantized]]) so the
    * compression pass and the search that consumes it can never train
    * different rails.
    */
  private[queries] def quantRailsOf(all: DataFrame): Option[(Column, Column)] = {
    val stats = all
      .select(posexplode(col("v")))
      .groupBy("pos")
      .agg(min("col").as("lo"), max("col").as("hi"))
      .collect().map(r => r.getInt(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    if (stats.isEmpty) None
    else {
      val dim = stats.keys.max + 1
      Some((
        array((0 until dim).map(i =>
          lit(stats.getOrElse(i, (0.0, 0.0))._1)).toIndexedSeq: _*),
        array((0 until dim).map(i =>
          lit(stats.getOrElse(i, (0.0, 0.0))._2)).toIndexedSeq: _*)))
    }
  }

  def embedQuantize(s: SparkSession, d: String): DataFrame = {
    val all = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val rails = quantRailsOf(all)
    if (rails.isEmpty) { // empty corpus: typed empty frame, not array() analysis errors
      val sess = s
      import sess.implicits._
      return Seq.empty[(Long, Long, Int)].toDF("vec_id", "dim", "q")
    }
    val (loLit, hiLit) = rails.get
    all.select(col("vec_id"), posexplode(col("v")))
      .select(col("vec_id"), col("pos").cast("long").as("dim"),
        {
          val i = (col("pos") + 1).cast("int")
          val lo = element_at(loLit, i)
          val hi = element_at(hiLit, i)
          when(hi > lo,
            (floor((col("col") - lo) / (hi - lo) * 255 + 0.5) - 128).cast("int"))
            .otherwise(lit(0)).as("q")
        })
  }

  /** Projection onto the top-k principal directions — the
    * dimensionality-reduction map that feeds 2-D corpus atlases and
    * compact downstream features. Components are [[pcaComponents]]
    * plan-time literals, so the projection is one map-side dot product
    * per component: (vec_id, component, score) with no shuffle of
    * vectors. Iterative plan-time state → rows-only for the driver;
    * ≡ a driver-side projection at 1e-6 in EmbeddingsSpec.
    */
  def embedProjectOn(embeddings: DataFrame, k: Int = PcaK,
      iters: Int = PcaIters): DataFrame = {
    val comps = pcaComponents(embeddings, k, iters)
    if (comps.isEmpty) { // empty corpus
      val s = embeddings.sparkSession
      import s.implicits._
      return Seq.empty[(Long, Long, Double)].toDF("vec_id", "component", "score")
    }
    val all = embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val scores = array(comps.zipWithIndex.map { case (u, c) =>
      struct(lit(c.toLong).as("component"),
        round(dot(col("v"), array(u.map(lit).toIndexedSeq: _*)), 6).as("score"))
    }.toIndexedSeq: _*)
    all.select(col("vec_id"), explode(scores).as("p"))
      .select(col("vec_id"), col("p.component").as("component"),
        col("p.score").as("score"))
  }

  def embedProject(s: SparkSession, d: String): DataFrame =
    embedProjectOn(Tables.embeddings(s, d))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "embed_stats" -> embedStats,
    "embed_normalize" -> embedNormalize,
    "embed_quantize" -> embedQuantize,
    "embed_project" -> embedProject,
    "pca_top" -> pcaTop,
    "pca_topk" -> pcaTopk)

  /** pca_top is iterative plan-time state — rows-only for the driver,
    * pinned to a sequential power iteration in EmbeddingsSpec.
    */
  def oracleSql: Map[String, String] = Map(
    "embed_quantize" ->
      """WITH dims AS (
        |  SELECT unnest(generate_series(1,
        |    (SELECT CAST(max(len(embedding)) AS INTEGER) FROM embeddings))) AS i),
        |st AS (
        |  SELECT i, min(CAST(embedding[i] AS DOUBLE)) AS lo,
        |    max(CAST(embedding[i] AS DOUBLE)) AS hi
        |  FROM embeddings, dims WHERE i <= len(embedding) GROUP BY i)
        |SELECT vec_id, CAST(st.i - 1 AS BIGINT) AS dim,
        |  CASE WHEN hi > lo
        |       THEN CAST(floor((CAST(embedding[st.i] AS DOUBLE) - lo)
        |                       / (hi - lo) * 255 + 0.5) - 128 AS INTEGER)
        |       ELSE 0 END AS q
        |FROM embeddings JOIN st ON st.i <= len(embedding)""".stripMargin,
    "embed_normalize" ->
      """WITH dims AS (
        |  SELECT unnest(generate_series(1,
        |    (SELECT CAST(max(len(embedding)) AS INTEGER) FROM embeddings))) AS i),
        |st AS (
        |  SELECT i, count(*) AS n,
        |    sum(CAST(embedding[i] AS DOUBLE)) AS s,
        |    sum(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)) AS ss
        |  FROM embeddings, dims WHERE i <= len(embedding) GROUP BY i),
        |ms AS (
        |  SELECT i, s / n AS m,
        |    CASE WHEN n > 1 THEN sqrt((ss - s * s / n) / (n - 1))
        |         ELSE 0.0 END AS sd
        |  FROM st)
        |SELECT vec_id, CAST(ms.i - 1 AS BIGINT) AS dim,
        |  CASE WHEN sd > 0
        |       THEN round((CAST(embedding[ms.i] AS DOUBLE) - m) / sd, 6)
        |       ELSE 0.0 END AS z
        |FROM embeddings JOIN ms ON ms.i <= len(embedding)""".stripMargin,
    "embed_stats" ->
      """WITH dims AS (
        |  SELECT unnest(generate_series(1,
        |    (SELECT CAST(max(len(embedding)) AS INTEGER) FROM embeddings))) AS i)
        |SELECT i - 1 AS dim, count(*) AS n,
        |  round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS mean,
        |  round(min(CAST(embedding[i] AS DOUBLE)), 6) AS lo,
        |  round(max(CAST(embedding[i] AS DOUBLE)), 6) AS hi,
        |  round(sum(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)), 6)
        |    AS l2_mass
        |FROM embeddings, dims WHERE i <= len(embedding)
        |GROUP BY 1""".stripMargin)
}
