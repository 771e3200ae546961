package graft

import graft.queries.{Passage, Summarize, TextOps}

/** search_chunks contracts (the score arithmetic is hash-gated by
  * the independent DuckDB reimplementation): ranking shape, and a
  * sequential relevance check — every returned passage actually
  * contains at least one of its query's terms.
  */
class PassageSpec extends SparkSuite {

  test("search_chunks: dense ranks, monotone scores, passages contain query terms") {
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        "[^\\p{L}]+".r.split(r.getString(1)).filter(_.nonEmpty))
      .toMap
    val got = Passage.searchChunks(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getDouble(4)))
    assert(got.nonEmpty)
    got.groupBy(_._1).foreach { case (qid, rows) =>
      val byRk = rows.sortBy(_._4)
      assert(byRk.map(_._4).toSeq == (1 to rows.length), s"query $qid ranks")
      assert(byRk.map(_._5).sliding(2).forall {
        case Array(a, b) => a >= b
        case _ => true
      }, s"query $qid scores not monotone")
      val qTerms = docs(qid).toSet
      byRk.foreach { case (_, doc, ci, _, _) =>
        val chunk = docs(doc).slice(ci.toInt * Summarize.ChunkLen,
          ci.toInt * Summarize.ChunkLen + Summarize.ChunkLen).toSet
        assert((chunk & qTerms).nonEmpty, s"query $qid passage ($doc,$ci) irrelevant")
      }
    }
    assert(got.map(_._1).distinct.length == TextOps.SearchQueryDocs)
  }
}
