package graft

import graft.queries.Mlm

/** MLM masking contracts: every position's decision replays from the
  * md5 draws, the rebuilt text matches token-for-token, and the mask
  * rate sits at the configured selection band. Cross-engine hashes
  * live under the DuckDB gate.
  */
class MlmSpec extends SparkSuite {

  private def md5mod(seed: String, mod: Long): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(seed.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 6), 16) % mod
  }

  test("mlm_mask replays exactly from the md5 draws") {
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        "[^\\p{L}]+".r.split(r.getString(1)).filter(_.nonEmpty).toSeq)
      .filter(_._2.nonEmpty).toMap
    val got = Mlm.mlmMask(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    assert(got.size == docs.size)
    var totTok = 0L; var totMask = 0L
    docs.foreach { case (id, ws) =>
      val exp = ws.zipWithIndex.map { case (w, i0) =>
        val r = md5mod(s"mlm:$id:${i0 + 1}", 100)
        if (r < Mlm.MaskPct) "[MASK]"
        else if (r < Mlm.KeepPct) w
        else if (r < Mlm.SelectPct)
          ws(md5mod(s"rep:$id:${i0 + 1}", ws.length).toInt)
        else w
      }
      val (n, nm, mt) = got(id)
      assert(n == ws.length)
      assert(nm == exp.count(_ == "[MASK]"), s"doc $id mask count")
      assert(mt == exp.mkString(" "), s"doc $id text")
      totTok += n; totMask += nm
    }
    // mask rate ~ MaskPct% (md5 is uniform; generous band)
    val rate = totMask.toDouble / totTok
    assert(rate > 0.08 && rate < 0.16, s"mask rate $rate out of band")
  }
}
