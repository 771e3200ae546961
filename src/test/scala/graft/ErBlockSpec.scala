package graft

import org.apache.spark.sql.functions.col
import graft.queries.Advanced

/** Blocked entity-resolution contracts: candidates only within a
  * block, match = edit distance ≤ 2, pair space over distinct names.
  */
class ErBlockSpec extends SparkSuite {

  test("er_block ≡ naive all-pairs over distinct names") {
    val parts = spark.read.parquet(s"$sfDir/part.parquet")
      .select("p_partkey", "p_name")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val names = parts.groupBy(_._2).map { case (n, rs) =>
      (n, rs.length.toLong, rs.map(_._1).min)
    }.toSeq

    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }

    val expect = (for {
      (na, ca, ka) <- names; (nb, cb, kb) <- names
      if na < nb && na.split(" ").last == nb.split(" ").last
      d = lev(na, nb) if d <= 2
    } yield (na, nb, d, ca, cb, ka, kb)).toSet

    val got = Advanced.erBlock(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toSet
    assert(got === expect && got.nonEmpty)

    // blocking is sound here: no cross-block pair is within distance 2
    val crossBlock = for {
      (na, _, _) <- names; (nb, _, _) <- names
      if na < nb && na.split(" ").last != nb.split(" ").last
    } yield lev(na, nb)
    assert(crossBlock.forall(_ > 2))
  }

  test("search_trigram: every typo'd query retrieves its original in the top 3") {
    val got = graft.queries.Advanced.searchTrigram(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getString(3)))
    assert(got.nonEmpty)
    val originals = spark.read.parquet(s"$sfDir/part.parquet")
      .where(col("p_partkey") < 5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // a 1-char deletion can land nearer a shorter sibling ("cld" →
    // "old"), so the contract is recall@3, not rank-1
    originals.foreach { case (qid, orig) =>
      val top3 = got.filter(_._1 == qid).map(_._4)
      assert(top3.contains(orig), s"top-3 for query $qid must contain '$orig'")
    }
    // the mutation actually changed the string (otherwise the test is vacuous)
    got.foreach { case (qid, q, _, _) => assert(q !== originals(qid)) }
  }

  test("q17_small_qty ≡ naive correlated-subquery recompute") {
    val parts = spark.read.parquet(s"$sfDir/part.parquet")
      .where(col("p_name").contains("bolt"))
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_partkey", "l_quantity", "l_extendedprice")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      .filter(r => parts.contains(r._1))
    val avgQty = li.groupBy(_._1).map { case (k, rs) =>
      k -> rs.map(_._2).sum / rs.length
    }
    val rev = li.filter(r => r._2 < 0.2 * avgQty(r._1))
      .map(r => math.floor(r._3 * 1e6 + 0.5)).sum / 1e6
    val expect = math.floor(rev / 7.0 * 100 + 0.5) / 100.0
    val got = graft.queries.Relational.q17SmallQty(spark, sfDir)
      .collect().head.getDouble(0)
    assert(got === expect && got > 0.0)
  }

  test("basket_pairs ≡ Scala recompute; lift is symmetric in the pair") {
    val items = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val np = items.groupBy(_._2).view.mapValues(_.length).toMap
    val nOrders = items.map(_._1).distinct.length
    val expect = items.groupBy(_._1).toSeq.flatMap { case (_, rs) =>
      val ps = rs.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).collect {
      case ((a, b), xs) if xs.length >= 3 =>
        (a, b) -> (xs.length.toLong,
          math.floor(xs.length.toDouble * nOrders / (np(a).toLong * np(b))
            * 10000 + 0.5) / 10000.0)
    }
    val got = graft.queries.Relational.basketPairs(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got === expect && got.nonEmpty)
  }

  test("er_resolve ≡ union-find over er_block pairs; sizes consistent") {
    val pairs = graft.queries.Advanced.erBlock(spark, sfDir).collect()
      .map(r => (r.getLong(5), r.getLong(6))) // canon_a, canon_b
    val names = spark.read.parquet(s"$sfDir/part.parquet")
      .select("p_partkey", "p_name").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._2).map { case (n, rs) => n -> (rs.length.toLong, rs.map(_._1).min) }
    // union-find over canonical keys
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expect = names.map { case (n, (cnt, canon)) => n -> (find(canon), cnt) }
    val got = graft.queries.Advanced.erResolve(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toMap
    assert(got.view.mapValues(v => (v._1, v._2)).toMap === expect)
    // entity sizes: n_names and n_parts_total agree with membership
    val byEntity = got.values.groupBy(_._1)
    byEntity.foreach { case (_, members) =>
      val m = members.head
      assert(members.size.toLong === m._3)
      assert(members.map(_._2).sum === m._4)
    }
    // at least one multi-name entity exists (cold/old merge)
    assert(byEntity.values.exists(_.size > 1))
  }

  test("column_stats ≡ Scala recount over collected lineitem") {
    val rows = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .collect()
    def colVals(i: Int): Seq[Double] =
      rows.toSeq.map(r => r.get(i) match {
        case null => Double.NaN
        case x: java.lang.Number => x.doubleValue()
      }).filterNot(_.isNaN)
    val names = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val got = graft.queries.Relational.columnStats(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
      .toMap
    names.zipWithIndex.foreach { case (n, i) =>
      val vs = colVals(i)
      val (nr, ndv, nn, mn, mx) = got(n)
      assert(nr === rows.length.toLong)
      assert(ndv === vs.distinct.length.toLong)
      assert(nn === (rows.length - vs.length).toLong)
      assert(mn === vs.min && mx === vs.max)
    }
  }
}
