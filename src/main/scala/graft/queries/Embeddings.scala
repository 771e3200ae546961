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
  def pcaTopOn(embeddings: DataFrame, iters: Int = PcaIters): DataFrame = {
    graft.functions.DotProduct.register(embeddings.sparkSession)
    val all = embeddings
      .select(col("embedding").cast("array<double>").as("v"))
      .persist()
    val dim = all.select(size(col("v"))).first().getInt(0)
    var vec = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    for (_ <- 1 to iters) {
      val vLit = array(vec.map(lit).toIndexedSeq: _*)
      val next = all
        .select(dot(col("v"), vLit).as("s"), posexplode(col("v")))
        .groupBy("pos")
        .agg(sum(col("s") * col("col")).as("w"))
        .collect() // dim rows — the bounded per-round driver action
      val raw = new Array[Double](dim)
      next.foreach(r => raw(r.getInt(0)) = r.getDouble(1))
      val nrm = math.sqrt(raw.map(x => x * x).sum)
      val sign = raw.find(math.abs(_) > 1e-9).map(x => math.signum(x)).getOrElse(1.0)
      vec = raw.map(_ / nrm * sign)
    }
    all.unpersist(false)
    val s = embeddings.sparkSession
    import s.implicits._
    vec.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toSeq
      .toDF("dim", "weight")
      .select(col("dim"), round(col("weight"), 6).as("weight"))
  }

  def pcaTop(s: SparkSession, d: String): DataFrame =
    pcaTopOn(Tables.embeddings(s, d))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "embed_stats" -> embedStats,
    "pca_top" -> pcaTop)

  /** pca_top is iterative plan-time state — rows-only for the driver,
    * pinned to a sequential power iteration in EmbeddingsSpec.
    */
  def oracleSql: Map[String, String] = Map(
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
