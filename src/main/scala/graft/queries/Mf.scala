package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{ModelCache, Tables}
import graft.core.Checkpoints.StableOps

/** Latent-factor matrix factorization ([EXT]) — FunkSVD-style rank-2
  * factors over the user×item interaction matrix, trained by
  * full-batch Jacobi gradient descent. The latent complement to
  * [[Recommend]]'s neighborhood CF.
  *
  * Exactness (the classifier_train integer-GD convention, applied to
  * two factor matrices): factors live in int64 micro-units, every
  * per-rating gradient term is floor-quantized to micro BEFORE the
  * per-user/per-item sum (integer sums are merge-order independent),
  * and updates divide with `div` — Spark's `div` and DuckDB's `//`
  * both truncate toward zero, so negative error terms round
  * identically. Init jitter is md5-derived (the shard-key
  * convention), reproducible in any engine with md5.
  *
  * Scale shape: per round ONE ratings⋈P⋈Q join chain materialized
  * once (it feeds both gradients), then two partial-agg'd |R|-row
  * exchanges (per-user and per-item gradient groupBys). P/Q are
  * |U|/|I|-row frames, checkpointed every round (each round's plan
  * references its predecessor through the shared error frame — the
  * graph_hits lineage rule). No driver action in the loop; nothing
  * is collected.
  */
object Mf {

  /** GD rounds — matches the unrolled oracle CTE chain. */
  val Rounds = 8
  /** Learning rate in micro (0.1). */
  val LrMicro = 100000L
  /** Rating cap: r = min(#orders with the pair, RCap). */
  val RCap = 5L
  /** Init jitter span (±0.1 around 1.0, micro). */
  val JitterMod = 200001L

  /** (u, i, r): capped multiplicity of distinct orders in which user
    * u bought item i. */
  private def ratings(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("u"), col("l_partkey").as("i"),
        col("l_orderkey").as("ok")).distinct()
      .groupBy("u", "i").agg(least(count(lit(1)), lit(RCap)).as("r"))

  /** md5-jittered factor init around 1.0: 1e6 + (md5(seed) mod
    * [[JitterMod]]) − 1e5 — symmetric ±0.1 micro band, distinct per
    * (kind, id, dim) so rank-2 symmetry is broken deterministically. */
  private def initF(kind: String, id: org.apache.spark.sql.Column, dim: Int) =
    lit(1000000L) +
      pmod(conv(substring(md5(
        concat(lit(s"$kind:"), id.cast("string"), lit(s":$dim"))), 1, 6),
        16, 10).cast("long"), lit(JitterMod)) - lit(100000L)

  /** Runs the GD chain; returns (P, Q) checkpointed. The |R|-row
    * ratings checkpoint that drives the rounds is RELEASED before
    * returning — only the model-sized factor frames outlive training
    * (the ModelCache bounded-retention contract; consumers that need
    * ratings rebuild the plain plan, one scan).
    */
  private def train(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    // pre-hashed on u: the per-round join against P (u-partitioned out
    // of its groupBy, checkpoint-preserved) is then exchange-free, and
    // after the i-side join the error frame is i-partitioned so the
    // per-item gradient groupBy is exchange-free too — one full |R|
    // exchange per round instead of three
    val rat = ratings(s, d).repartition(col("u")).stable
    var p = rat.select(col("u")).distinct()
      .select(col("u"), initF("p", col("u"), 1).as("p1"),
        initF("p", col("u"), 2).as("p2")).stable
    var q = rat.select(col("i")).distinct()
      .select(col("i"), initF("q", col("i"), 1).as("q1"),
        initF("q", col("i"), 2).as("q2")).stable
    // Factor frames reliably checkpoint at stride 2 (persist between):
    // each round references its predecessors ~3× through the shared
    // error frame, so a 2-round window holds ≤9 subtree refs — bounded
    // plan — while halving the 2-jobs-plus-file-I/O truncation cost the
    // every-round form paid (4 stableLoops/round → 2). Scratch (the
    // per-round error frame and superseded factors) retires at the next
    // checkpoint: between checkpoints the new factors are LAZY, so an
    // early unpersist would void the e-cache both gradient branches
    // share.
    val retired = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    for (t <- 1 to Rounds) {
      val e = rat.join(p, "u").join(q, "i")
        .withColumn("e", expr("r * 1000000L - (p1*q1 + p2*q2) div 1000000L"))
        .persist()
      val gp = e.groupBy("u").agg(
        sum(expr("(e * q1) div 1000000L")).as("g1"),
        sum(expr("(e * q2) div 1000000L")).as("g2"),
        count(lit(1)).as("n"))
      val gq = e.groupBy("i").agg(
        sum(expr("(e * p1) div 1000000L")).as("g1"),
        sum(expr("(e * p2) div 1000000L")).as("g2"),
        count(lit(1)).as("n"))
      var pn = p.join(gp, "u").select(col("u"),
        expr(s"p1 + ($LrMicro * g1) div (1000000L * n)").as("p1"),
        expr(s"p2 + ($LrMicro * g2) div (1000000L * n)").as("p2"))
      var qn = q.join(gq, "i").select(col("i"),
        expr(s"q1 + ($LrMicro * g1) div (1000000L * n)").as("q1"),
        expr(s"q2 + ($LrMicro * g2) div (1000000L * n)").as("q2"))
      val isCkpt = t % 2 == 0 || t == Rounds
      if (isCkpt) { pn = pn.stableLoop; qn = qn.stableLoop }
      else { pn = pn.persist(); qn = qn.persist() }
      retired += e; retired += p; retired += q
      if (isCkpt) { retired.foreach(_.unpersist(false)); retired.clear() }
      p = pn; q = qn
    }
    retired.foreach(_.unpersist(false))
    graft.core.Checkpoints.release(rat)
    (p, q)
  }

  /** Train-once/serve-many wiring ([[ModelCache]]): `mf_train` always
    * retrains (its cost stays an honest measure of the GD chain) and
    * REFRESHES the session cache; `mf_predict` reuses the checkpointed
    * factor frames when the session already trained, and trains on
    * demand otherwise — each entry stays self-contained, and the
    * md5-seeded integer GD makes a hit bit-identical to a fresh run.
    * Only the |U|/|I|-row factor checkpoints are cached (model-sized);
    * the |R|-row ratings input is NEVER cached — `mf_predict` rebuilds
    * its plain plan (one scan per execution, no pinned storage).
    *
    * Durable tier ([[graft.core.ModelStore]]): when
    * `spark.graft.modelDir` is set, `mf_train` also persists the
    * factor frames as parquet and a NEW session's `mf_predict`
    * warm-starts from disk — training survives the JVM.
    */
  private val ModelKey = "mf_factors"
  private val ModelConstants =
    s"rounds=$Rounds,lr=$LrMicro,rcap=$RCap,jit=$JitterMod"

  private def trainRefresh(s: SparkSession, d: String)
      : (DataFrame, DataFrame) =
    graft.core.ModelStore.putDurable(s, d, ModelKey, ModelConstants,
      train(s, d)) { case (p, q) => Seq(p, q) }

  private def trainCached(s: SparkSession, d: String)
      : (DataFrame, DataFrame) =
    graft.core.ModelStore.cachedDurable(s, d, ModelKey, ModelConstants, 2)(
      train(s, d)) { case (p, q) => Seq(p, q) } {
      case Seq(p, q) => (p, q)
    }

  /** Trained factors, tall: (kind, id, f1, f2) for every user and
    * item. */
  def mfTrain(s: SparkSession, d: String): DataFrame = {
    val (p, q) = trainRefresh(s, d)
    p.select(lit("user").as("kind"), col("u").as("id"),
        col("p1").as("f1"), col("p2").as("f2"))
      .unionAll(q.select(lit("item").as("kind"), col("i").as("id"),
        col("q1").as("f1"), col("q2").as("f2")))
  }

  /** Reconstruction on the observed pairs: rating, integer-micro
    * prediction, and signed error — the honest eval surface (serving
    * top-k lives in [[Recommend]]; scoring unobserved users×items
    * would be a cross product). */
  def mfPredict(s: SparkSession, d: String): DataFrame = {
    val (p, q) = trainCached(s, d)
    ratings(s, d).join(p, "u").join(q, "i")
      .select(col("u"), col("i"), col("r"),
        expr("(p1*q1 + p2*q2) div 1000000L").as("pred_micro"),
        expr("r * 1000000L - (p1*q1 + p2*q2) div 1000000L").as("err_micro"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mf_train" -> mfTrain,
    "mf_predict" -> mfPredict)

  /** Shared oracle chain: ratings, md5 init, [[Rounds]] unrolled
    * Jacobi rounds. */
  private def chainSql: String = {
    def init(kind: String, idCol: String, dim: Int): String =
      s"""1000000 + CAST(('0x' || substr(md5('$kind:' ||
         | CAST($idCol AS VARCHAR) || ':$dim'), 1, 6))::UBIGINT
         | % $JitterMod AS BIGINT) - 100000""".stripMargin.replace("\n", "")
    val rounds = (1 to Rounds).map { t =>
      s"""e_$t AS MATERIALIZED (
         |  SELECT r.u, r.i, r.r, p.p1, p.p2, q.q1, q.q2,
         |    r.r * 1000000 - (p.p1*q.q1 + p.p2*q.q2) // 1000000 AS e
         |  FROM ratings r JOIN p_${t - 1} p USING (u) JOIN q_${t - 1} q USING (i)),
         |p_$t AS MATERIALIZED (
         |  SELECT u,
         |    CAST(any_value(p1) + ($LrMicro * sum((e * q1) // 1000000))
         |      // (1000000 * count(*)) AS BIGINT) AS p1,
         |    CAST(any_value(p2) + ($LrMicro * sum((e * q2) // 1000000))
         |      // (1000000 * count(*)) AS BIGINT) AS p2
         |  FROM e_$t GROUP BY u),
         |q_$t AS MATERIALIZED (
         |  SELECT i,
         |    CAST(any_value(q1) + ($LrMicro * sum((e * p1) // 1000000))
         |      // (1000000 * count(*)) AS BIGINT) AS q1,
         |    CAST(any_value(q2) + ($LrMicro * sum((e * p2) // 1000000))
         |      // (1000000 * count(*)) AS BIGINT) AS q2
         |  FROM e_$t GROUP BY i)""".stripMargin
    }.mkString(",\n")
    s"""ratings AS MATERIALIZED (
       |  SELECT u, i, CAST(least(count(*), $RCap) AS BIGINT) AS r
       |  FROM (SELECT DISTINCT o.o_custkey AS u, l.l_partkey AS i,
       |          l.l_orderkey AS ok
       |        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
       |  GROUP BY u, i),
       |p_0 AS MATERIALIZED (
       |  SELECT u, ${init("p", "u", 1)} AS p1, ${init("p", "u", 2)} AS p2
       |  FROM (SELECT DISTINCT u FROM ratings)),
       |q_0 AS MATERIALIZED (
       |  SELECT i, ${init("q", "i", 1)} AS q1, ${init("q", "i", 2)} AS q2
       |  FROM (SELECT DISTINCT i FROM ratings)),
       |$rounds""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
    "mf_train" ->
      s"""WITH $chainSql
         |SELECT 'user' AS kind, u AS id, p1 AS f1, p2 AS f2 FROM p_$Rounds
         |UNION ALL
         |SELECT 'item', i, q1, q2 FROM q_$Rounds""".stripMargin,
    "mf_predict" ->
      s"""WITH $chainSql
         |SELECT r.u, r.i, r.r,
         |  (p.p1*q.q1 + p.p2*q.q2) // 1000000 AS pred_micro,
         |  r.r * 1000000 - (p.p1*q.q1 + p.p2*q.q2) // 1000000 AS err_micro
         |FROM ratings r JOIN p_$Rounds p USING (u) JOIN q_$Rounds q USING (i)""".stripMargin)
}
