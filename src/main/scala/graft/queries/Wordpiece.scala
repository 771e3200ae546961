package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** WordPiece-style greedy longest-match-first subword encoding (the
  * BERT tokenizer's inference rule — Wu et al. 2016; distinct from
  * BPE's merge-replay, which segments by REPLAYING training history:
  * greedy matching can fuse across merge boundaries, e.g. a vocab
  * entry learned as (co, lu) still matches inside "column" as the
  * single longest piece "colu"). Continuation pieces carry the "##"
  * mark.
  *
  * Vocabulary = the corpus alphabet plus every BPE merge output
  * (alphabet ∪ {l+r}) learned by [[Tokenize.bpeMergesOn]] — data-
  * derived and deterministic, so the whole train→encode composition
  * sits under the DuckDB gate (the encoder unrolls as a recursive CTE
  * on top of the shared train chain).
  *
  * Scale design: the encoder runs ONCE PER DISTINCT WORD (the module's
  * weighted-vocabulary law — the raw token stream never reaches it),
  * with the vocab (NMerges + |alphabet| entries) broadcast in the
  * closure. The per-word scan is genuinely imperative lookahead
  * (variable-length skip — not expressible as a Catalyst fold, whose
  * accumulator consumes exactly one element per step), so this is the
  * documented typed-map case: per-partition logic over a
  * corpus-sublinear frame.
  */
object Wordpiece {

  /** (w, f, n_pieces, pieces): greedy segmentation of every distinct
    * corpus word, frequency-weighted for downstream aggregation.
    */
  def wordpieceEncode(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val spark = docs.sparkSession
    import spark.implicits._
    // session-cached training (ModelCache via Tokenize.mergesFor):
    // encode no longer re-runs the NMerges-round trainer when
    // bpe_train/bpe_encode already ran this session
    val merges = Tokenize.mergesFor(s, d).map(t => t._2 + t._3)
    val symSet = merges.toSet
    val maxLen = if (symSet.isEmpty) 1 else symSet.map(_.length).max
    val wf = docs.select(explode(Dedup.tokensCol(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))
    wf.as[(String, Long)].map { case (w, f) =>
      val pieces = scala.collection.mutable.ArrayBuffer.empty[String]
      var pos = 0
      while (pos < w.length) {
        var len = math.min(maxLen, w.length - pos)
        while (len > 1 && !symSet.contains(w.substring(pos, pos + len))) len -= 1
        val piece = w.substring(pos, pos + len)
        pieces += (if (pos == 0) piece else "##" + piece)
        pos += len
      }
      (w, f, pieces.length.toLong, pieces.mkString(" "))
    }.toDF("w", "f", "n_pieces", "pieces")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "wordpiece_encode" -> wordpieceEncode)

  /** Greedy matching as a recursive CTE over the shared BPE train
    * chain. The longest-match argmax is a LEFT JOIN + max(len) in the
    * recursive term — a correlated scalar subquery there silently
    * returns NULL in DuckDB, so the join form is load-bearing, not
    * style. coalesce(...,1) is the single-character fallback (the
    * alphabet is in the vocab, so it only fires as a guard).
    */
  def oracleSql: Map[String, String] = {
    val mergeSyms = (1 to Tokenize.NMerges)
      .map(i => s"SELECT l || r AS sym FROM m$i").mkString(" UNION ")
    Map(
      "wordpiece_encode" ->
        s"""WITH RECURSIVE ${Tokenize.chainSql},
           |chars AS (SELECT DISTINCT substr(w, CAST(d.i AS INTEGER), 1) AS sym
           |          FROM wf, dims d WHERE d.i <= len(w)),
           |vocab AS MATERIALIZED (
           |  SELECT sym FROM ($mergeSyms) UNION SELECT sym FROM chars),
           |enc AS (
           |  SELECT w, f, CAST(1 AS BIGINT) AS pos,
           |    CAST('' AS VARCHAR) AS pieces, CAST(0 AS BIGINT) AS n
           |  FROM wf
           |  UNION ALL
           |  SELECT w, f, pos + glen,
           |    pieces || CASE WHEN pos = 1 THEN '' ELSE ' ##' END
           |      || substr(w, CAST(pos AS INTEGER), CAST(glen AS INTEGER)),
           |    n + 1
           |  FROM (
           |    SELECT e.w, e.f, e.pos, e.pieces, e.n,
           |      coalesce(max(len(v.sym)), 1) AS glen
           |    FROM (SELECT * FROM enc WHERE pos <= len(w)) e
           |    LEFT JOIN vocab v ON len(v.sym) <= len(e.w) - e.pos + 1
           |      AND substr(e.w, CAST(e.pos AS INTEGER), CAST(len(v.sym) AS INTEGER)) = v.sym
           |    GROUP BY e.w, e.f, e.pos, e.pieces, e.n) g)
           |SELECT w, f, n AS n_pieces, pieces
           |FROM enc WHERE pos = len(w) + 1""".stripMargin)
  }
}
