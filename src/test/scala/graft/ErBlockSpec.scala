package graft

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
}
