package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Dataset-card generator ([EXT]): the one-row summary a published
  * dataset ships with (Gebru et al., "Datasheets for Datasets") —
  * corpus size, vocabulary spread, language/source coverage,
  * exact-duplicate rate, and the quality-gate survival rate, all in a
  * single pass-per-fact query. The operational use is drift review:
  * diff two cards to see what an ingest batch changed.
  *
  * Composition: token stats and the Gopher keep rate reuse the
  * [[QualityRules]] flag pass (one tokenize); the dup rate is
  * digest-only (md5, text never shuffles). Three 1-row frames
  * cross-join into the card — O(1) row output at any corpus size.
  */
object CorpusCard {

  def corpusCard(s: SparkSession, d: String): DataFrame = {
    val flags = QualityRules.qualityGopher(s, d)
    val main = flags.agg(
      count(lit(1)).as("n_docs"),
      sum("n_words").as("n_tokens"),
      sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"))
    val docs = Tables.documents(s, d)
    val diversity = docs.agg(
      sum("n_chars").as("n_chars"),
      countDistinct("lang").as("n_langs"),
      countDistinct("source").as("n_sources"),
      countDistinct(md5(col("text"))).as("n_unique_texts"))
    main.crossJoin(broadcast(diversity))
      .select(col("n_docs"), col("n_tokens"), col("n_chars"),
        col("n_langs"), col("n_sources"),
        (floor((lit(1.0) - col("n_unique_texts").cast("double") / col("n_docs"))
          * 10000 + 0.5) / 1e4).as("dup_rate"),
        (floor(col("n_keep").cast("double") / col("n_docs") * 10000 + 0.5) / 1e4)
          .as("keep_rate"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_card" -> corpusCard)

  def oracleSql: Map[String, String] = Map(
    "corpus_card" ->
      s"""WITH ${QualityRules.tokSql},
         |${QualityRules.flagsSql},
         |kept AS (
         |  SELECT *, rule_words AND rule_word_len AND rule_repetition
         |    AND rule_stopwords AS keep FROM ruled),
         |main AS (
         |  SELECT count(*) AS n_docs,
         |    CAST(sum(n_words) AS BIGINT) AS n_tokens,
         |    CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
         |  FROM kept),
         |div AS (
         |  SELECT CAST(sum(n_chars) AS BIGINT) AS n_chars,
         |    count(DISTINCT lang) AS n_langs,
         |    count(DISTINCT source) AS n_sources,
         |    count(DISTINCT md5(text)) AS n_unique_texts
         |  FROM documents)
         |SELECT n_docs, n_tokens, n_chars, n_langs, n_sources,
         |  floor((1.0 - CAST(n_unique_texts AS DOUBLE) / n_docs) * 10000 + 0.5)
         |    / 1e4 AS dup_rate,
         |  floor(CAST(n_keep AS DOUBLE) / n_docs * 10000 + 0.5) / 1e4 AS keep_rate
         |FROM main, div""".stripMargin)
}
