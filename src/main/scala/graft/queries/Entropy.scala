package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Token-distribution entropy per source [EXT] — the corpus-health
  * number next to [[TextOps]]' vocab/quality censuses: low unigram
  * entropy flags templated or repetitive sources (the weak-diversity
  * signal that survives exact dedup), high entropy flags token salad.
  * H = −Σ p_w ln p_w over the source's token distribution, each term
  * nano-quantized BEFORE the sum (the MI/chi² integer-aggregate
  * rule), so the per-source fold is merge-order free.
  *
  * Scale shape: one tokenize pass → (source, token) hash agg →
  * vocab-bounded term frame → integer sum. Nothing scales beyond
  * the vocabulary.
  */
object Entropy {

  def tokenEntropy(s: SparkSession, d: String): DataFrame = {
    val cnt = Tables.documents(s, d)
      .select(col("source"), explode(Dedup.tokensCol(col("text"))).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("nw"))
    val tot = cnt.groupBy("source").agg(sum("nw").as("n_tokens"),
      count(lit(1)).as("vocab"))
    cnt.join(broadcast(tot), "source")
      .select(col("source"), col("n_tokens"), col("vocab"),
        floor((col("nw").cast("double") / col("n_tokens"))
          * log(col("n_tokens").cast("double") / col("nw"))
          * 1e9 + lit(0.5)).cast("long").as("term_nano"))
      .groupBy("source", "n_tokens", "vocab")
      .agg(sum("term_nano").as("entropy_nano"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "token_entropy" -> tokenEntropy)

  def oracleSql: Map[String, String] = Map(
    "token_entropy" ->
      """WITH cnt AS (
        |  SELECT source, w, count(*) AS nw
        |  FROM (SELECT source,
        |          unnest(list_filter(string_split_regex(text, '[^\p{L}]+'),
        |                             x -> len(x) > 0)) AS w
        |        FROM documents)
        |  GROUP BY source, w),
        |tot AS (SELECT source, CAST(sum(nw) AS BIGINT) AS n_tokens,
        |          count(*) AS vocab
        |        FROM cnt GROUP BY source)
        |SELECT c.source, t.n_tokens, t.vocab,
        |  CAST(sum(CAST(floor((CAST(nw AS DOUBLE) / t.n_tokens)
        |    * ln(CAST(t.n_tokens AS DOUBLE) / nw) * 1e9 + 0.5) AS BIGINT))
        |    AS BIGINT) AS entropy_nano
        |FROM cnt c JOIN tot t USING (source)
        |GROUP BY c.source, t.n_tokens, t.vocab""".stripMargin)
}
