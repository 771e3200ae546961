package graft

import graft.queries.Mf
import org.apache.spark.sql.functions._

/** Matrix-factorization contracts: the distributed integer GD equals
  * a sequential in-JVM replication round for round, and training
  * reduces reconstruction SSE versus the init factors. Cross-engine
  * hashes live under the DuckDB gate.
  */
class MfSpec extends SparkSuite {

  private val M = 1000000L

  private def md5mod(seed: String, mod: Long): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(seed.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 6), 16) % mod
  }
  private def init(kind: String, id: Long, dim: Int): Long =
    1000000L + md5mod(s"$kind:$id:$dim", Mf.JitterMod) - 100000L

  private def ratings(): Seq[(Long, Long, Long)] =
    graft.core.Tables.lineitem(spark, sfDir)
      .join(graft.core.Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_partkey"), col("l_orderkey"))
      .distinct().collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .groupBy(_._1).toSeq
      .map { case ((u, i), g) => (u, i, math.min(g.size.toLong, Mf.RCap)) }

  /** Sequential replication of the exact integer Jacobi GD. */
  private def trainSeq(rat: Seq[(Long, Long, Long)])
      : (Map[Long, (Long, Long)], Map[Long, (Long, Long)]) = {
    var p = rat.map(_._1).distinct
      .map(u => u -> (init("p", u, 1), init("p", u, 2))).toMap
    var q = rat.map(_._2).distinct
      .map(i => i -> (init("q", i, 1), init("q", i, 2))).toMap
    for (_ <- 1 to Mf.Rounds) {
      val terms = rat.map { case (u, i, r) =>
        val (p1, p2) = p(u); val (q1, q2) = q(i)
        val e = r * M - (p1 * q1 + p2 * q2) / M
        (u, i, e, p1, p2, q1, q2)
      }
      val pn = terms.groupBy(_._1).map { case (u, g) =>
        val (p1, p2) = p(u)
        val g1 = g.map(t => t._3 * t._6 / M).sum
        val g2 = g.map(t => t._3 * t._7 / M).sum
        u -> (p1 + Mf.LrMicro * g1 / (M * g.size),
          p2 + Mf.LrMicro * g2 / (M * g.size))
      }
      val qn = terms.groupBy(_._2).map { case (i, g) =>
        val (q1, q2) = q(i)
        val g1 = g.map(t => t._3 * t._4 / M).sum
        val g2 = g.map(t => t._3 * t._5 / M).sum
        i -> (q1 + Mf.LrMicro * g1 / (M * g.size),
          q2 + Mf.LrMicro * g2 / (M * g.size))
      }
      p = pn; q = qn
    }
    (p, q)
  }

  test("mf_train equals the sequential integer Jacobi GD") {
    val rat = ratings()
    val (p, q) = trainSeq(rat)
    val got = Mf.mfTrain(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.size == p.size + q.size)
    p.foreach { case (u, f) => assert(got(("user", u)) == f, s"user $u") }
    q.foreach { case (i, f) => assert(got(("item", i)) == f, s"item $i") }
  }

  test("mf_predict reconstruction improves on the init factors") {
    val rat = ratings()
    val got = Mf.mfPredict(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.size == rat.size)
    var sseInit = BigInt(0); var sseTrained = BigInt(0)
    rat.foreach { case (u, i, r) =>
      val (gr, pred, err) = got((u, i))
      assert(gr == r)
      assert(err == r * M - pred)
      val e0 = r * M - (init("p", u, 1) * init("q", i, 1)
        + init("p", u, 2) * init("q", i, 2)) / M
      sseInit += BigInt(e0) * BigInt(e0)
      sseTrained += BigInt(err) * BigInt(err)
    }
    assert(sseTrained < sseInit,
      s"GD did not reduce SSE: $sseTrained vs init $sseInit")
    // sanity: trained reconstruction is substantially better, not a
    // noise-level wiggle
    assert(sseTrained * 10 < sseInit * 9, s"SSE drop under 10%")
  }

  test("integer division truncation matches between engines' operators") {
    // the GD chain relies on Spark `div` ≡ DuckDB `//` for NEGATIVE
    // error terms: both truncate toward zero
    val df = spark.range(1).selectExpr("-7L div 2L AS a", "7L div -2L AS b")
    val r = df.collect()(0)
    assert(r.getLong(0) == -3L && r.getLong(1) == -3L)
  }
}
