package graft

import graft.queries.{Tokenize, Wordpiece}
import graft.core.Tables

/** WordPiece encoder contracts: reconstruction, vocab membership, and
  * the greedy longest-match-first property against a sequential
  * reference. Cross-engine equality lives under the DuckDB gate.
  */
class WordpieceSpec extends SparkSuite {

  private lazy val rows =
    Wordpiece.wordpieceEncode(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))

  private lazy val symSet =
    Tokenize.bpeMergesOn(Tables.documents(spark, sfDir)).collect()
      .map(r => r.getString(1) + r.getString(2)).toSet

  private def piecesOf(s: String): Array[String] =
    s.split(" ").map(_.stripPrefix("##"))

  test("pieces reconstruct the word; count matches") {
    assert(rows.nonEmpty)
    rows.foreach { case (w, _, n, pieces) =>
      val ps = piecesOf(pieces)
      assert(ps.mkString === w, s"$w -> $pieces does not reconstruct")
      assert(ps.length.toLong === n)
      // decoration: first piece bare, rest ##-marked
      val raw = pieces.split(" ")
      assert(!raw.head.startsWith("##"))
      assert(raw.tail.forall(_.startsWith("##")))
    }
  }

  test("every multi-char piece is a learned BPE symbol") {
    rows.foreach { case (w, _, _, pieces) =>
      piecesOf(pieces).filter(_.length > 1).foreach { p =>
        assert(symSet.contains(p), s"$w piece '$p' not in vocab")
      }
    }
  }

  test("greedy longest-match: no longer symbol matches at any piece start") {
    val maxLen = if (symSet.isEmpty) 1 else symSet.map(_.length).max
    rows.foreach { case (w, _, _, pieces) =>
      var pos = 0
      piecesOf(pieces).foreach { p =>
        // any strictly longer candidate at this position must miss
        ((p.length + 1) to math.min(maxLen, w.length - pos)).foreach { l =>
          assert(!symSet.contains(w.substring(pos, pos + l)),
            s"$w@$pos: took '$p' but '${w.substring(pos, pos + l)}' is in vocab")
        }
        pos += p.length
      }
    }
  }

  test("frequencies are the corpus word frequencies") {
    import org.apache.spark.sql.functions._
    val wf = Tables.documents(spark, sfDir)
      .select(explode(graft.queries.Dedup.tokensCol(col("text"))).as("w"))
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { case (w, f, _, _) => assert(wf(w) === f, s"freq mismatch for $w") }
  }
}
