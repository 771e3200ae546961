package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Blocklist screening [EXT] — the C4-style "badwords" curation
  * pass (Raffel et al. 2020 filtered on a phrase list; every
  * production corpus runs one): match a fixed phrase list against
  * the lowercased corpus and report, per (source, phrase), how many
  * documents hit and the total occurrence count — the triage view a
  * curation team reads before deciding drop-vs-mask. Phrases that
  * never occur simply produce no row (inner semantics, both
  * engines).
  *
  * Occurrences are counted by the replace-and-measure identity
  * (len(text) − len(replace(text, t, ''))) / len(t) — pure integer
  * arithmetic on non-overlapping-match semantics, which `replace`
  * shares in Spark and DuckDB.
  *
  * Scale shape: the phrase list is a literal array exploded per doc
  * (|terms|-fold map-side fan-out, no join, no shuffle of text);
  * the aggregate collapses to |sources|×|terms| cells. At 100 TB
  * with a big blocklist the explode becomes an Aho-Corasick native
  * expression — the plan shape (map + cell agg) is already the
  * right one.
  */
object Blocklist {

  /** Fixed demo blocklist — mixed present/absent phrases in the
    * synthetic corpus vocabulary.
    */
  val Terms: Seq[String] = Seq(
    "slow query", "merge join", "hash join", "data skew", "slow")

  def blocklistReport(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("source"), lower(col("text")).as("t"))
      .select(col("source"), col("t"),
        explode(array(Terms.map(lit): _*)).as("term"))
      .filter(col("t").contains(col("term")))
      .select(col("source"), col("term"),
        ((length(col("t")) - length(expr("replace(t, term, '')")))
          / length(col("term"))).cast("long").as("hits"))
      .groupBy("source", "term")
      .agg(count(lit(1)).as("n_docs"), sum("hits").as("n_hits"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "blocklist_report" -> blocklistReport)

  def oracleSql: Map[String, String] = Map(
    "blocklist_report" -> {
      val lits = Terms.map(t => s"'$t'").mkString(", ")
      s"""WITH m AS (
         |  SELECT source, lower(text) AS t, term
         |  FROM documents, unnest([$lits]) AS u(term)
         |  WHERE contains(lower(text), term))
         |SELECT source, term, count(*) AS n_docs,
         |  CAST(sum((len(t) - len(replace(t, term, ''))) // len(term))
         |    AS BIGINT) AS n_hits
         |FROM m GROUP BY source, term""".stripMargin
    })
}
