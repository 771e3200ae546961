package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.core.Checkpoints.StableOps

/** Greedy k-center coreset sampling ([EXT]) — Gonzalez '85
  * farthest-point traversal over the embedding corpus: pick the
  * point farthest from everything picked so far, k times. The
  * diversity-selection pass a training-data pipeline runs to build a
  * small cover of embedding space (2-approximation of the optimal
  * k-center radius); the selected radius sequence doubles as a
  * cluster-scale profile.
  *
  * Exactness: distances are squared L2 over the int8-quantized rails
  * shared with embed_quantize/ann_quantized — integer cell
  * arithmetic end to end, so every pick and radius reproduces
  * bit-for-bit in the SQL oracle (the quantization IS the standard
  * serving representation; see ann_quantized's recall audit).
  *
  * Scale shape: the working state is one (vec_id, qv, d2min) frame;
  * each of the k rounds is a 1-row TakeOrdered pick broadcast
  * against a single map pass (zip_with square distance + least) — no
  * shuffle inside the loop at all, k linear passes total (the
  * textbook greedy k-center schedule). Lineage is checkpointed at
  * stride 3; nothing is collected.
  */
object Coreset {

  /** Selected sample size (and unrolled oracle rounds). */
  val KCenters = 12

  /** Greedy picks: (rk, vec_id, radius2) — radius2 is the picked
    * point's squared distance to the nearest earlier pick, i.e. the
    * coverage radius the sample guarantees after rk−1 centers.
    *
    * Each round's pick is taken to the DRIVER (one k-bounded
    * TakeOrdered row per round — the [[Embeddings.quantRailsOf]]
    * bounded-collect class: k·dim longs total) and fed back as column
    * LITERALS, so every round is a pure map pass over the persisted
    * state frame — no per-round broadcast-exchange cascade, and the
    * returned picks frame is a 12-row LOCAL relation instead of a
    * union of 12 lazy TakeOrdered subtrees that all re-execute (each
    * through up to stride−1 recomputed map passes) when the final
    * frame materializes. Measured r14: that re-execution tail was
    * ~half the query's wall. The greedy schedule, the quantized
    * arithmetic, and the (d2min DESC, vec_id ASC) pick order are
    * unchanged — identical rows by construction.
    */
  def sampleKcenter(s: SparkSession, d: String): DataFrame = {
    val all = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val rails = Embeddings.quantRailsOf(all)
    val sess = s
    import sess.implicits._
    if (rails.isEmpty)
      return Seq.empty[(Long, Long, Long)].toDF("rk", "vec_id", "radius2")
    val (loLit, hiLit) = rails.get
    val qvecs = all.select(col("vec_id"),
      zip_with(col("v"), sequence(lit(1), size(col("v"))), (x, i) => {
        val lo = element_at(loLit, i.cast("int"))
        val hi = element_at(hiLit, i.cast("int"))
        when(hi > lo, (floor((x - lo) / (hi - lo) * 255 + 0.5) - 128)
          .cast("long")).otherwise(lit(0L))
      }).as("qv")).stable

    def d2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0L), (acc, t) => acc + t)
    def qvLit(v: Seq[Long]): org.apache.spark.sql.Column = typedlit(v)

    val pickRows = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    // first center: smallest id (deterministic, engine-independent)
    val first = qvecs.orderBy(col("vec_id").asc).take(1)
    if (first.isEmpty)
      return Seq.empty[(Long, Long, Long)].toDF("rk", "vec_id", "radius2")
    pickRows += ((1L, first(0).getLong(0), 0L))
    var best = qvecs.select(col("vec_id"), col("qv"),
      d2(col("qv"), qvLit(first(0).getSeq[Long](1))).as("d2min")).persist()
    val retired = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var done = false
    for (rk <- 2 to KCenters if !done) {
      val sel = best.orderBy(col("d2min").desc, col("vec_id").asc).take(1)
      if (sel.isEmpty) done = true
      else {
        pickRows += ((rk.toLong, sel(0).getLong(0), sel(0).getLong(2)))
        // the post-final-pick distance update has no consumer — skip it
        if (rk < KCenters) {
          var next = best.select(col("vec_id"), col("qv"),
            least(col("d2min"), d2(col("qv"), qvLit(sel(0).getSeq[Long](1))))
              .as("d2min"))
          next = if (rk % 3 == 0) next.stableLoop else next.persist()
          retired += best
          if (rk % 3 == 0) { retired.foreach(_.unpersist(false)); retired.clear() }
          best = next
        }
      }
    }
    best.unpersist(false); qvecs.unpersist(false)
    retired.foreach(_.unpersist(false))
    pickRows.toSeq.toDF("rk", "vec_id", "radius2")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sample_kcenter" -> sampleKcenter)

  def oracleSql: Map[String, String] = Map(
    "sample_kcenter" -> {
      // cell-join distance form (≡ the Spark zip_with sum); every
      // round CTE MATERIALIZED — b_t is referenced by both the pick
      // and the next least-join. The selected center's cells are
      // pre-filtered in a derived table: with the scalar-subquery
      // predicate written inline in the join condition DuckDB left it
      // ABOVE the dim join, making each round |cells|×|vecs| (measured
      // 376.8 s for the 12-round chain at sf0.001; pre-filtered form
      // 7.9 s, identical rows — it was the whole gate's slowest oracle
      // by 9×, a direct driver-capture-budget risk)
      val rounds = (2 to KCenters).map { t =>
        s"""p_$t AS MATERIALIZED (
           |  SELECT vec_id, d2min FROM b_${t - 1}
           |  ORDER BY d2min DESC, vec_id ASC LIMIT 1),
           |dist_$t AS (
           |  SELECT c.vec_id, CAST(sum((c.q - sc.q) * (c.q - sc.q)) AS BIGINT) AS d2
           |  FROM qcells c JOIN (SELECT dim, q FROM qcells
           |    WHERE vec_id = (SELECT vec_id FROM p_$t)) sc ON sc.dim = c.dim
           |  GROUP BY c.vec_id),
           |b_$t AS MATERIALIZED (
           |  SELECT b.vec_id, least(b.d2min, d.d2) AS d2min
           |  FROM b_${t - 1} b JOIN dist_$t d USING (vec_id))""".stripMargin
      }.mkString(",\n")
      val pickRows = (2 to KCenters).map { t =>
        s"SELECT CAST($t AS BIGINT) AS rk, vec_id, d2min AS radius2 FROM p_$t"
      }.mkString("\nUNION ALL\n")
      s"""WITH dims AS (
         |  SELECT unnest(generate_series(1,
         |    (SELECT CAST(max(len(embedding)) AS INTEGER) FROM embeddings))) AS i),
         |st AS (
         |  SELECT i, min(CAST(embedding[i] AS DOUBLE)) AS lo,
         |    max(CAST(embedding[i] AS DOUBLE)) AS hi
         |  FROM embeddings, dims WHERE i <= len(embedding) GROUP BY i),
         |qcells AS MATERIALIZED (
         |  SELECT vec_id, st.i AS dim,
         |    CASE WHEN hi > lo
         |         THEN CAST(floor((CAST(embedding[st.i] AS DOUBLE) - lo)
         |                         / (hi - lo) * 255 + 0.5) - 128 AS BIGINT)
         |         ELSE 0 END AS q
         |  FROM embeddings JOIN st ON st.i <= len(embedding)),
         |p_1 AS (SELECT min(vec_id) AS vec_id FROM qcells),
         |dist_1 AS (
         |  SELECT c.vec_id, CAST(sum((c.q - sc.q) * (c.q - sc.q)) AS BIGINT) AS d2
         |  FROM qcells c JOIN (SELECT dim, q FROM qcells
         |    WHERE vec_id = (SELECT vec_id FROM p_1)) sc ON sc.dim = c.dim
         |  GROUP BY c.vec_id),
         |b_1 AS MATERIALIZED (SELECT vec_id, d2 AS d2min FROM dist_1),
         |$rounds
         |SELECT CAST(1 AS BIGINT) AS rk, vec_id, CAST(0 AS BIGINT) AS radius2
         |FROM p_1
         |UNION ALL
         |$pickRows""".stripMargin
    })
}
