package graft

import graft.queries.Trees

/** CART contracts: the root split is the true Gini argmax over every
  * (feature, threshold) candidate (brute-forced from the collected
  * feature frame), leaves partition the corpus, and per-doc
  * predictions equal manual tree application. Cross-engine hashes
  * live under the DuckDB gate.
  */
class TreesSpec extends SparkSuite {

  private def feats() = Trees.featsWide(spark, sfDir).collect().map { r =>
    (r.getLong(0), r.getLong(1),
      Map("f_stop" -> r.getLong(2), "f_punct" -> r.getLong(3),
        "f_wlen" -> r.getLong(4), "f_len" -> r.getLong(5)))
  }

  /** Brute-force best (feature, thr, score) over a doc subset with the
    * operator's exact IEEE chain and tie order. */
  private def bestOf(rows: Seq[(Long, Long, Map[String, Long])])
      : (String, Long, Long) = {
    val n = rows.size.toLong
    val cands = for {
      f <- Seq("f_len", "f_punct", "f_stop", "f_wlen") // asc tie order
      t <- rows.map(_._3(f)).distinct.sorted
      left = rows.filter(_._3(f) <= t) if left.size < rows.size
    } yield {
      val (nl, pl) = (left.size.toLong, left.map(_._2).sum)
      val (nr, pr) = (n - nl, rows.map(_._2).sum - pl)
      val al = pl * pl + (nl - pl) * (nl - pl)
      val ar = pr * pr + (nr - pr) * (nr - pr)
      val score = math.floor(
        (al.toDouble / nl + ar.toDouble / nr) / n * 1e6 + 0.5).toLong
      (f, t, score)
    }
    cands.maxBy { case (f, t, sc) => (sc, -fIdx(f), -t) }
  }
  private def fIdx(f: String): Long =
    Seq("f_len", "f_punct", "f_stop", "f_wlen").indexOf(f).toLong

  test("tree_train: root is the Gini argmax; leaves partition the corpus") {
    val rows = feats().toSeq
    val got = Trees.treeTrain(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("root", "L", "R", "LL", "LR", "RL", "RR"))
    val root = got("root")
    val (bf, bt, bs) = bestOf(rows)
    assert(root.getString(1) == bf && root.getLong(2) == bt,
      s"root ${root.getString(1)}<=${root.getLong(2)} vs $bf<=$bt")
    assert(root.getLong(3) == bs)
    assert(root.getLong(4) == rows.size && root.getLong(5) == rows.map(_._2).sum)
    // each child's split is the argmax within its side
    val lrows = rows.filter(_._3(bf) <= bt)
    val rrows = rows.filter(_._3(bf) > bt)
    Seq("L" -> lrows, "R" -> rrows).foreach { case (side, sub) =>
      val c = got(side)
      val (cf, ct, cs) = bestOf(sub)
      assert(c.getString(1) == cf && c.getLong(2) == ct && c.getLong(3) == cs,
        s"$side split")
      assert(c.getLong(4) == sub.size && c.getLong(5) == sub.map(_._2).sum)
    }
    // leaves partition: counts and positives add up; majority votes
    val leafN = Seq("LL", "LR", "RL", "RR").map(l => got(l).getLong(4)).sum
    assert(leafN == rows.size)
    Seq("LL", "LR", "RL", "RR").foreach { l =>
      val r = got(l)
      assert(r.getBoolean(6) == (r.getLong(5) * 2 > r.getLong(4)), s"$l vote")
    }
  }

  test("tree_predict equals manual tree application and beats majority") {
    val rows = feats().toSeq
    val nodes = Trees.treeTrain(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    def leafOf(fs: Map[String, Long]): String = {
      val root = nodes("root")
      val side = if (fs(root.getString(1)) <= root.getLong(2)) "L" else "R"
      val c = nodes(side)
      side + (if (fs(c.getString(1)) <= c.getLong(2)) "L" else "R")
    }
    val got = Trees.treePredict(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getBoolean(2), r.getBoolean(3)))
      .toMap
    assert(got.size == rows.size)
    var correct = 0L
    rows.foreach { case (id, isEn, fs) =>
      val (leaf, pred, actual) = got(id)
      assert(leaf == leafOf(fs), s"doc $id leaf")
      assert(pred == nodes(leaf).getBoolean(6), s"doc $id pred")
      assert(actual == (isEn == 1L))
      if (pred == actual) correct += 1
    }
    val nPos = rows.map(_._2).sum
    val majority = math.max(nPos, rows.size - nPos)
    assert(correct >= majority,
      s"tree accuracy $correct under majority baseline $majority")
  }
}
