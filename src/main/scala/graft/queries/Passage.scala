package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** PASSAGE retrieval [EXT] — BM25 at chunk granularity: the corpus
  * side of [[TextOps.searchBm25On]] re-indexed as 12-token chunks
  * (the [[Summarize]]/[[Curation]] chunk unit) so each query returns
  * the best PASSAGES, not documents — the retrieval shape a RAG
  * serving stack actually runs (generators consume passages; doc
  * ranking alone leaves the reader to find the span). Same held-out
  * query docs, same integer-quantized contribution convention (idf
  * micro-floored, per-term contribution nano-floored → integer sums,
  * merge-order free), with chunk-level df/dl/avgdl in the formula.
  *
  * Scale shape: identical to search_bm25 — one tokenize+chunk pass
  * to postings, vocabulary-bounded stats frames, broadcast query
  * side; chunking multiplies posting rows by ~1 (each token is in
  * exactly one chunk).
  */
object Passage {

  def searchChunks(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val qn = TextOps.SearchQueryDocs
    val qterms = docs.filter(col("doc_id") < qn)
      .select(col("doc_id").as("query_id"),
        explode(array_distinct(Dedup.tokensCol(col("text")))).as("term"))
    val postings = docs.filter(col("doc_id") >= qn)
      .select(col("doc_id"), Dedup.tokensCol(col("text")).as("ws"))
      .select(col("doc_id"), col("ws"), size(col("ws")).as("n"))
      .where(col("n") > 0)
      .select(col("doc_id"), col("ws"),
        explode(expr(s"sequence(0, (n - 1) DIV ${Summarize.ChunkLen})")).as("ci"))
      .select(col("doc_id"), col("ci"),
        explode(slice(col("ws"), col("ci") * Summarize.ChunkLen + 1,
          lit(Summarize.ChunkLen))).as("term"))
    val tf = postings.groupBy("doc_id", "ci", "term")
      .agg(count(lit(1)).as("n_td"))
    val dls = tf.groupBy("doc_id", "ci").agg(sum("n_td").as("dl"))
    val stats = dls.agg(sum("dl").cast("double").as("total_tok"),
      count(lit(1)).as("n_chunks"))
    val contrib = tf.crossJoin(broadcast(stats))
      .withColumn("df", count(lit(1)).over(Window.partitionBy("term")))
      .withColumn("dl",
        sum("n_td").over(Window.partitionBy("doc_id", "ci")))
      .withColumn("idf",
        floor(log((col("n_chunks") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
          + lit(1.0)) * lit(1e6) + lit(0.5)) / lit(1e6))
      .withColumn("cint",
        floor(col("idf") * (col("n_td") * lit(2.2)) /
          (col("n_td") + lit(1.2) *
            (lit(0.25) + lit(0.75) * col("dl") / (col("total_tok") / col("n_chunks"))))
          * lit(1e9) + lit(0.5)).cast("long"))
    val scored = contrib.join(broadcast(qterms), "term")
      .groupBy("query_id", "doc_id", "ci").agg(sum("cint").as("sint"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sint").desc, col("doc_id").asc, col("ci").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= TextOps.SearchTopK)
      .select(col("query_id"), col("doc_id"), col("ci").as("chunk_id"),
        col("rk"), round(col("sint") / lit(1e9), 6).as("score"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "search_chunks" -> searchChunks)

  def oracleSql: Map[String, String] = Map(
    "search_chunks" ->
      s"""WITH qd AS (
         |  SELECT doc_id AS query_id,
         |    unnest(list_distinct(list_filter(
         |      string_split_regex(text, '[^\\p{L}]+'), x -> len(x) > 0))) AS term
         |  FROM documents WHERE doc_id < ${TextOps.SearchQueryDocs}),
         |cw AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex(text, '[^\\p{L}]+'),
         |                x -> len(x) > 0) AS ws
         |  FROM documents WHERE doc_id >= ${TextOps.SearchQueryDocs}),
         |t AS (
         |  SELECT doc_id, ci.ci,
         |    unnest(ws[ci.ci * ${Summarize.ChunkLen} + 1 :
         |              ci.ci * ${Summarize.ChunkLen} + ${Summarize.ChunkLen}]) AS term
         |  FROM cw, unnest(generate_series(0,
         |         (len(ws) - 1) // ${Summarize.ChunkLen})) AS ci(ci)
         |  WHERE len(ws) > 0),
         |tf AS (SELECT doc_id, ci, term, count(*) AS n_td FROM t GROUP BY 1, 2, 3),
         |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |dls AS (SELECT doc_id, ci, sum(n_td) AS dl FROM tf GROUP BY 1, 2),
         |st AS (SELECT CAST(sum(dl) AS DOUBLE) AS total_tok,
         |         count(*) AS n_chunks FROM dls),
         |c AS (
         |  SELECT tf.doc_id, tf.ci, tf.term,
         |    CAST(floor(
         |      (floor(ln((st.n_chunks - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
         |             * 1000000.0 + 0.5) / 1000000.0)
         |      * (tf.n_td * 2.2)
         |      / (tf.n_td + 1.2 * (0.25 + 0.75 * dls.dl
         |           / (st.total_tok / st.n_chunks)))
         |      * 1000000000.0 + 0.5) AS BIGINT) AS cint
         |  FROM tf JOIN dfreq USING (term)
         |  JOIN dls ON dls.doc_id = tf.doc_id AND dls.ci = tf.ci
         |  CROSS JOIN st),
         |sc AS (SELECT q.query_id, c.doc_id, c.ci, sum(c.cint) AS sint
         |       FROM c JOIN qd q USING (term) GROUP BY 1, 2, 3)
         |SELECT query_id, doc_id, chunk_id, rk, score FROM (
         |  SELECT query_id, doc_id, ci AS chunk_id,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY sint DESC, doc_id, ci) AS INTEGER) AS rk,
         |    round(CAST(sint AS DOUBLE) / 1000000000.0, 6) AS score
         |  FROM sc)
         |WHERE rk <= ${TextOps.SearchTopK}""".stripMargin)
}
