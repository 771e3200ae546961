package graft

import graft.queries.Blocklist

/** blocklist_report contracts: per-(source, term) doc and occurrence
  * counts equal a sequential indexOf scan (non-overlapping matches),
  * and absent phrases yield no rows.
  */
class BlocklistSpec extends SparkSuite {

  private def countOcc(text: String, term: String): Long = {
    var i = 0; var n = 0L
    while ({ i = text.indexOf(term, i); i >= 0 }) { n += 1; i += term.length }
    n
  }

  test("blocklist_report equals the sequential scan") {
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).toLowerCase))
    val expect = (for {
      (src, t) <- docs
      term <- Blocklist.Terms
      occ = countOcc(t, term) if occ > 0
    } yield ((src, term), occ))
      .groupBy(_._1).view
      .mapValues(v => (v.length.toLong, v.map(_._2).sum)).toMap
    val got = Blocklist.blocklistReport(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == expect)
    assert(expect.nonEmpty)
    // replace-and-measure counts NON-overlapping matches, like indexOf
    assert(countOcc("aaaa", "aa") == 2L)
  }
}
