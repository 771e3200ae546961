package graft

import graft.queries.Readability

/** Readability contracts: counts and both scores equal a sequential
  * re-computation with the same vowel-group/sentence heuristics.
  * Cross-engine hashes live under the DuckDB gate.
  */
class ReadabilitySpec extends SparkSuite {

  test("readability_score equals the sequential Flesch computation") {
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = Readability.readabilityScore(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got.size == docs.size)
    docs.foreach { case (id, text) =>
      val ws = "[^\\p{L}]+".r.split(text).filter(_.nonEmpty)
      val nW = math.max(ws.length.toLong, 1L)
      val nS = math.max("[.!?]+".r.findAllIn(text).length.toLong, 1L)
      val nSyl = ws.map(w =>
        math.max("[aeiouy]+".r.findAllIn(w.toLowerCase).length, 1).toLong).sum
      val flesch = math.floor((206.835 - 1.015 * (nW.toDouble / nS)
        - 84.6 * (nSyl.toDouble / nW)) * 1e6 + 0.5).toLong
      val fk = math.floor((0.39 * (nW.toDouble / nS)
        + 11.8 * (nSyl.toDouble / nW) - 15.59) * 1e6 + 0.5).toLong
      val (gw, gs, gy, gf, gk) = got(id)
      assert(gw == nW && gs == nS && gy == nSyl, s"doc $id counts")
      assert(gf == flesch, s"doc $id flesch")
      assert(gk == fk, s"doc $id fk grade")
    }
  }
}
