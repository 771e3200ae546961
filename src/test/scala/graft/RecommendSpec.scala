package graft

import graft.queries.Recommend
import org.apache.spark.sql.functions._

/** Item-item CF contracts: cosine against a brute-force reference,
  * neighbor-list symmetry/rank, and recommendation validity.
  * Cross-engine values live under the DuckDB gate.
  */
class RecommendSpec extends SparkSuite {

  private lazy val positives: Set[(Long, Long)] =
    graft.core.Tables.lineitem(spark, sfDir)
      .join(graft.core.Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("item_cf cosine matches brute force over the interaction matrix") {
    // sf0.001 baskets are far below MaxBasket, so the cap is a no-op
    // and the capped table IS the positive table
    val byItem = positives.groupBy(_._2).map { case (p, s) => p -> s.map(_._1).toSet }
    val rows = Recommend.itemCf(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (p, q, co, cosMicro, rk) =>
      val ua = byItem(p); val ub = byItem(q)
      val coExp = (ua & ub).size
      assert(co == coExp, s"($p,$q) co=$co expected $coExp")
      assert(co >= Recommend.CoMin)
      val cosExp = math.floor(
        co.toDouble / math.sqrt(ua.size.toDouble * ub.size.toDouble) * 1e6 + 0.5).toLong
      assert(cosMicro == cosExp, s"($p,$q) cos $cosMicro vs $cosExp")
      assert(rk >= 1 && rk <= Recommend.TopK)
    }
    // top-k: no kept neighbor is beaten by an excluded candidate
    val kept = rows.groupBy(_._1)
    kept.foreach { case (p, ns) =>
      assert(ns.map(_._2).distinct.length == ns.length, s"dup neighbor for $p")
      if (ns.length == Recommend.TopK) {
        val worst = ns.map(_._4).min
        val all = byItem.keys.filter(q => q != p && (byItem(p) & byItem(q)).size >= 2)
        all.foreach { q =>
          val c = (byItem(p) & byItem(q)).size
          val cm = math.floor(
            c.toDouble / math.sqrt(byItem(p).size.toDouble * byItem(q).size.toDouble) * 1e6 + 0.5).toLong
          if (!ns.exists(_._2 == q))
            assert(cm <= worst, s"excluded $q of $p with cos $cm beats kept worst $worst")
        }
      }
    }
  }

  test("recommendations are unseen items scored by exact neighbor-vote sums") {
    val nbrs = Recommend.itemCf(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    val recs = Recommend.itemRecommend(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(recs.nonEmpty)
    val byUser = positives.groupBy(_._1).map { case (u, s) => u -> s.map(_._2).toSet }
    recs.foreach { case (u, rec, score, nSrc, rk) =>
      assert(!byUser(u).contains(rec), s"user $u recommended already-bought $rec")
      val votes = byUser(u).toSeq.flatMap(p => nbrs.filter(n => n._1 == p && n._2 == rec))
      assert(votes.length == nSrc, s"user $u rec $rec n_src $nSrc vs ${votes.length}")
      assert(votes.map(_._3).sum == score, s"user $u rec $rec score mismatch")
      assert(rk >= 1 && rk <= Recommend.RecK)
    }
    recs.groupBy(_._1).foreach { case (u, rs) =>
      assert(rs.length <= Recommend.RecK)
      // rank order follows (score desc, id asc)
      val sorted = rs.sortBy(_._5)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3 > b._3 || (a._3 == b._3 && a._2 < b._2), s"rank order broken for $u")
        case _ =>
      }
    }
  }
}
