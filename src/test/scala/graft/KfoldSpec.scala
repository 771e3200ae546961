package graft

import graft.queries.Kfold

/** Stratified k-fold contracts: within every stratum the fold sizes
  * differ by at most one (the round-robin deal), the census replays
  * from the md5 ranking, and shares are exact micro ratios.
  * Cross-engine hashes live under the DuckDB gate.
  */
class KfoldSpec extends SparkSuite {

  private def md5hex(seed: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(seed.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("stratified_kfold deals round-robin within every stratum") {
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val exp = docs.groupBy(_._2).toSeq.flatMap { case (lang, g) =>
      g.map(_._1).sortBy(id => (md5hex(s"kf:$id"), id)).zipWithIndex
        .map { case (_, i) => (lang, i.toLong % Kfold.Folds) }
    }.groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val got = Kfold.stratifiedKfold(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.size == exp.size)
    exp.foreach { case ((lang, fold), n) =>
      val (gn, nStr, share) = got((fold, lang))
      assert(gn == n, s"($lang, $fold)")
      assert(nStr == exp.filter(_._1._1 == lang).values.sum)
      assert(share == n * 1000000L / nStr)
    }
    // balance: within each stratum max-min fold size <= 1
    exp.groupBy(_._1._1).foreach { case (lang, cells) =>
      val sizes = cells.values
      assert(sizes.max - sizes.min <= 1, s"stratum $lang unbalanced")
    }
  }
}
