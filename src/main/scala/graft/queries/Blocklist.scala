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

  /** The scale form of [[blocklistReport]]: the native Aho-Corasick
    * expression ([[graft.functions.MultiMatch]]) counts ALL
    * occurrences of every phrase in ONE text pass — no per-term
    * fan-out, whole-stage codegen intact. Semantics differ from the
    * replace-and-measure twin exactly where overlaps do: this is the
    * every-start-position census (so "aaaa" holds three "aa"s, and a
    * hit inside a longer hit still counts), which is what a
    * match-position consumer (masking, span excision) needs.
    */
  def blocklistNative(s: SparkSession, d: String): DataFrame = {
    val termArr = array(Terms.map(lit): _*)
    Tables.documents(s, d)
      .select(col("source"),
        graft.functions.MultiMatch.countsCol(lower(col("text")), Terms).as("cs"))
      .select(col("source"), posexplode(col("cs")).as(Seq("i", "hits")))
      .filter(col("hits") > 0)
      .select(col("source"),
        element_at(termArr, col("i") + 1).as("term"), col("hits"))
      .groupBy("source", "term")
      .agg(count(lit(1)).as("n_docs"), sum("hits").as("n_hits"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "blocklist_report" -> blocklistReport,
    "blocklist_native" -> blocklistNative)

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
    },
    "blocklist_native" -> {
      val lits = Terms.map(t => s"'$t'").mkString(", ")
      // every-start-position census: count i where substr(t,i,len)=term
      s"""WITH m AS (
         |  SELECT source, term,
         |    len(list_filter(generate_series(1, len(t) - len(term) + 1),
         |      i -> substr(t, i, len(term)) = term)) AS hits
         |  FROM (SELECT source, lower(text) AS t FROM documents),
         |       unnest([$lits]) AS u(term)),
         |f AS (SELECT source, term, CAST(hits AS BIGINT) AS hits
         |      FROM m WHERE hits > 0)
         |SELECT source, term, count(*) AS n_docs,
         |  CAST(sum(hits) AS BIGINT) AS n_hits
         |FROM f GROUP BY source, term""".stripMargin
    })
}
