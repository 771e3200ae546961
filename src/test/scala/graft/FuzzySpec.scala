package graft

import graft.queries.Fuzzy

/** Fuzzy-join contracts. The load-bearing one: the two-band length
  * blocking is LOSSLESS relative to the documented (lang, prefix2)
  * block — the operator's output equals the naive all-pairs
  * same-lang same-prefix2 Levenshtein join, i.e. banding only cuts
  * cost, never recall within contract.
  */
class FuzzySpec extends SparkSuite {

  private def lev(a: String, b: String): Int = {
    val prev = Array.tabulate(b.length + 1)(identity)
    val cur = new Array[Int](b.length + 1)
    for (i <- 1 to a.length) {
      cur(0) = i
      for (j <- 1 to b.length) {
        val sub = prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)
        cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), sub)
      }
      Array.copy(cur, 0, prev, 0, b.length + 1)
    }
    prev(b.length)
  }

  test("fuzzy_join_lev equals the naive same-lang same-prefix2 lev join") {
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).take(64).toLowerCase))
    val expect = (for {
      (ia, la, ka) <- docs
      (ib, lb, kb) <- docs
      if ia < ib && la == lb && ka.take(2) == kb.take(2)
      d = lev(ka, kb) if d <= Fuzzy.FuzzyMaxLev
    } yield (ia, ib) -> d.toLong).toMap
    val got = Fuzzy.fuzzyJoinLev(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2).toLong).toMap
    assert(got == expect, s"got=${got.size} expect=${expect.size}")
    assert(expect.nonEmpty, "test corpus should contain fuzzy pairs")
  }

  test("phonetic key matches textbook soundex on run-free words") {
    import spark.implicits._
    import org.apache.spark.sql.functions.expr
    // cases that avoid the H/W-transparency refinement the simplified
    // Odell variant deliberately omits (documented in Fuzzy.scala)
    val cases = Seq("Robert" -> "R163", "Rupert" -> "R163",
      "widget" -> "W323", "gear" -> "G600", "anvil" -> "A514",
      "bolt" -> "B430", "Tymczak" -> "T522")
    val got = cases.map(_._1).toDF("word")
      .select(expr(Fuzzy.phoneticKeySql("word")).as("k"))
      .collect().map(_.getString(0))
    assert(got.toSeq == cases.map(_._2), s"got ${got.toSeq}")
  }

  test("er_phonetic co-blocks every er_block pair (exact word ⊆ sound-alike)") {
    val exact = graft.queries.Advanced.erBlock(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val phon = Fuzzy.erPhonetic(spark, sfDir).collect()
      .map(r => (r.getString(1), r.getString(2))).toSet
    assert(exact.subsetOf(phon),
      s"er_block pairs missing from er_phonetic: ${exact -- phon}")
    phon.foreach { case (a, b) => assert(a < b, "pair order contract") }
  }
}
