package graft

import graft.queries.Summarize

/** summarize_extract contracts (the full rank arithmetic is
  * hash-gated against the independent DuckDB reimplementation —
  * rounds, graph and all): structural invariants plus a sequential
  * recompute of graph membership — every extracted chunk must
  * actually share ≥3 informative tokens with a sibling chunk.
  */
class SummarizeSpec extends SparkSuite {

  test("summarize_extract: top-2 per doc, members of the chunk graph, ranks sane") {
    val got = Summarize.summarizeExtract(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(got.nonEmpty)
    got.groupBy(_._1).foreach { case (doc, rows) =>
      val rks = rows.map(_._3).sorted.toSeq
      assert(rks == (1 to rows.length), s"doc $doc ranks not dense: $rks")
      assert(rows.length <= Summarize.TopK)
      // rk order agrees with (rank desc, chunk asc)
      val byRk = rows.sortBy(_._3).map(t => (t._4, t._2))
      assert(byRk.sliding(2).forall {
        case Array((r1, c1), (r2, c2)) => r1 > r2 || (r1 == r2 && c1 < c2)
        case _ => true
      }, s"doc $doc rank ordering")
    }
    assert(got.forall(t => t._4 > 0.0 && t._4 <= 1.0))
    // sequential graph membership: each selected chunk shares >= 3
    // distinct len>=3 tokens with some other chunk of its doc
    val chunksByDoc = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect().map { r =>
        val ws = "[^\\p{L}]+".r.split(r.getString(1)).filter(_.nonEmpty)
        r.getLong(0) -> ws.grouped(Summarize.ChunkLen)
          .map(_.filter(_.length >= Summarize.MinTokLen).toSet).toArray
      }.toMap
    got.foreach { case (doc, ci, _, _) =>
      val cs = chunksByDoc(doc)
      val mine = cs(ci.toInt)
      val partner = cs.indices.exists(j =>
        j != ci.toInt && (mine & cs(j)).size >= Summarize.MinShared)
      assert(partner, s"doc $doc chunk $ci has no qualifying sibling")
    }
  }
}
