package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** N-gram overlap eval metrics [EXT] — ROUGE-N recall and clipped
  * BLEU precision (Papineni et al. 2002; Lin 2004), the scoring half
  * of a summarization/generation eval pipeline. Harnessed here on a
  * deterministic candidate/reference pair available in every corpus:
  * candidate = the LEAD 20% of each document's tokens, reference =
  * the remaining body. That makes the metrics double as curation
  * signals — lead-vs-body ROUGE recall is a redundancy detector
  * (boilerplate-heavy docs repeat their lead), and the same clipped
  * n-gram machinery scores real (candidate, reference) text pairs
  * unchanged.
  *
  * Mechanics: clipped matches Σ_g min(count_cand(g), count_ref(g))
  * computed RELATIONALLY — explode each side to (doc, gram, count)
  * and inner-join on (doc, gram); grams absent from either side
  * contribute zero and never materialize. Per-doc metrics are
  * micro-quantized int64, per-source averages are exact integer
  * sums DIV counts — merge-order free end to end.
  *
  * Scale shape: map-side n-gram explode → one (doc, gram) hash agg
  * per side → an equi join keyed (doc, gram) → per-doc then
  * per-source hash aggs. No window, no driver state; everything
  * partitions by doc_id.
  */
object Evals {

  /** Docs shorter than this many tokens are skipped (the lead must
    * hold a bigram and the body must dominate the lead).
    */
  private val MinTokens = 10

  /** Shared lead-20%/body split as TOKEN ARRAYS — ROUGE/BLEU's
    * clipped token counting and chrF's char-gram counting both build
    * on this frame, so the split convention (MinTokens floor,
    * ceil(len/5) lead) lives in ONE place and the metrics cannot
    * silently diverge.
    */
  private def leadBody(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"), Dedup.tokensCol(col("text")).as("ws"))
      .select(col("doc_id"), col("source"), col("ws"), size(col("ws")).as("len"))
      .filter(col("len") >= MinTokens)
      .select(col("doc_id"), col("source"),
        ceil(col("len") / lit(5.0)).cast("int").as("c_len"), col("len"),
        col("ws"))
      .select(col("doc_id"), col("source"), col("c_len"),
        (col("len") - col("c_len")).as("b_len"),
        slice(col("ws"), lit(1), col("c_len")).as("lead"),
        slice(col("ws"), col("c_len") + lit(1), col("len") - col("c_len"))
          .as("body"))

  /** Clipped matches Σ_g min(count_a(g), count_b(g)) per doc over any
    * (doc_id, gram-array, gram-array) frame — the counting core every
    * n-gram-overlap metric here shares.
    */
  private def clippedOn(frame: DataFrame, a: String, b: String,
      out: String): DataFrame = {
    def cnt(arr: String) = frame
      .select(col("doc_id"), explode(col(arr)).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
    cnt(a).withColumnRenamed("c", "ca")
      .join(cnt(b).withColumnRenamed("c", "cb"), Seq("doc_id", "g"))
      .groupBy("doc_id").agg(sum(least(col("ca"), col("cb"))).as(out))
  }

  /** Per-doc frame: doc_id, source, c_len (lead tokens), b_len (body
    * tokens), m1/m2 (clipped unigram/bigram matches).
    */
  private def perDoc(s: SparkSession, d: String): DataFrame = {
    // bigram arrays from MATERIALIZED token-array attributes (HOFs
    // re-evaluate non-attribute subtrees per element — Dedup.shingles'
    // rule)
    def bigrams(arr: String) = transform(
      sequence(lit(1), size(col(arr)) - 1),
      i => concat_ws(" ", element_at(col(arr), i), element_at(col(arr), i + 1)))
    val sides = leadBody(s, d).select(col("doc_id"), col("source"),
      col("c_len"), col("b_len"), col("lead"), col("body"),
      bigrams("lead").as("lead2"), bigrams("body").as("body2"))

    sides.select("doc_id", "source", "c_len", "b_len")
      .join(clippedOn(sides, "lead", "body", "m1"), Seq("doc_id"), "left")
      .join(clippedOn(sides, "lead2", "body2", "m2"), Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"), col("c_len"), col("b_len"),
        coalesce(col("m1"), lit(0L)).as("m1"),
        coalesce(col("m2"), lit(0L)).as("m2"))
  }

  /** ROUGE-1/2 recall of the lead against the body, averaged per
    * source (micro units): how much of the body's content the lead
    * already covers — the redundancy read.
    */
  def evalRouge(s: SparkSession, d: String): DataFrame =
    perDoc(s, d)
      .select(col("source"),
        floor(col("m1").cast("double") / col("b_len") * 1e6 + lit(0.5))
          .cast("long").as("r1_t"),
        floor(col("m2").cast("double") / (col("b_len") - 1) * 1e6 + lit(0.5))
          .cast("long").as("r2_t"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        expr("CAST(sum(r1_t) AS BIGINT) DIV count(1)").as("rouge1_micro"),
        expr("CAST(sum(r2_t) AS BIGINT) DIV count(1)").as("rouge2_micro"))

  /** Clipped BLEU-2 of the lead against the body (precision side +
    * brevity penalty exp(1 − r/c), geometric-mean score), averaged
    * per source.
    */
  def evalBleu(s: SparkSession, d: String): DataFrame =
    perDoc(s, d)
      .select(col("source"),
        floor(col("m1").cast("double") / col("c_len") * 1e6 + lit(0.5))
          .cast("long").as("p1_t"),
        floor(col("m2").cast("double") / (col("c_len") - 1) * 1e6 + lit(0.5))
          .cast("long").as("p2_t"),
        floor(exp(lit(1.0) - col("b_len").cast("double") / col("c_len"))
          * sqrt((col("m1").cast("double") / col("c_len"))
            * (col("m2").cast("double") / (col("c_len") - 1)))
          * 1e6 + lit(0.5)).cast("long").as("bleu_t"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        expr("CAST(sum(p1_t) AS BIGINT) DIV count(1)").as("p1_micro"),
        expr("CAST(sum(p2_t) AS BIGINT) DIV count(1)").as("p2_micro"),
        expr("CAST(sum(bleu_t) AS BIGINT) DIV count(1)").as("bleu2_micro"))

  /** chrF-STYLE score (β=2, after Popović 2015's chrF₂ — but NOT the
    * reference metric: standard chrF averages n=1..6 char-gram
    * F-scores over whitespace-STRIPPED text, while this harness blends
    * only 2-/3-grams over the space-joined token streams, so grams
    * span token boundaries and scores are deliberately not comparable
    * to sacrebleu-style chrF numbers; cross-engine agreement is what
    * the gate certifies) of the lead against the body — the
    * character-n-gram F-score companion to the token-level
    * ROUGE/BLEU pair (robust to tokenization and morphology; the
    * standard MT/generation eval third leg). Same deterministic
    * lead-20%/body harness; candidate and reference are the
    * space-joined token streams, grams are character 2- and 3-grams.
    *
    * Exactness: with P = m/ca and R = m/cb, the β=2 F-score
    * 5PR/(4P+R) collapses algebraically to 5m/(ca + 4cb) — ONE
    * double division of exact integers per (doc, n), micro-quantized;
    * the 2/3-gram blend is (f2+f3+1) DIV 2 and per-source averages
    * are integer sums DIV counts. No libm anywhere.
    *
    * Scale shape: char-gram explode is text-linear (bounded fan-out
    * ×2 over the token explode), then the same (doc, gram) equi-join
    * reduction as [[perDoc]] — absent grams never materialize.
    */
  def evalChrf(s: SparkSession, d: String): DataFrame = {
    val base = leadBody(s, d)
      .select(col("doc_id"), col("source"),
        concat_ws(" ", col("lead")).as("cand"),
        concat_ws(" ", col("body")).as("ref"))
    def grams(src: String, n: Int) = transform(
      sequence(lit(1), length(col(src)) - (n - 1)),
      i => substring(col(src), i, lit(n)))
    val sides = base.select(col("doc_id"), col("source"),
      grams("cand", 2).as("c2"), grams("ref", 2).as("r2"),
      grams("cand", 3).as("c3"), grams("ref", 3).as("r3"))

    def clippedN(a: String, b: String, out: String) =
      clippedOn(sides, a, b, out)
    sides.select(col("doc_id"), col("source"),
        size(col("c2")).cast("long").as("ca2"),
        size(col("r2")).cast("long").as("cb2"),
        size(col("c3")).cast("long").as("ca3"),
        size(col("r3")).cast("long").as("cb3"))
      .join(clippedN("c2", "r2", "m2"), Seq("doc_id"), "left")
      .join(clippedN("c3", "r3", "m3"), Seq("doc_id"), "left")
      .select(col("source"),
        floor(lit(5.0) * coalesce(col("m2"), lit(0L)) * 1e6
          / (col("ca2") + lit(4L) * col("cb2")) + lit(0.5))
          .cast("long").as("f2"),
        floor(lit(5.0) * coalesce(col("m3"), lit(0L)) * 1e6
          / (col("ca3") + lit(4L) * col("cb3")) + lit(0.5))
          .cast("long").as("f3"))
      .select(col("source"), col("f2"), col("f3"),
        expr("(f2 + f3 + 1) DIV 2").as("fb"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        expr("CAST(sum(f2) AS BIGINT) DIV count(1)").as("chrf2_micro"),
        expr("CAST(sum(f3) AS BIGINT) DIV count(1)").as("chrf3_micro"),
        expr("CAST(sum(fb) AS BIGINT) DIV count(1)").as("chrf_micro"))
  }

  /** distinct-n diversity (Li et al. 2016 "A Diversity-Promoting
    * Objective") — the generation-diversity leg of the eval family
    * and the mode-collapse detector for synthetic corpora: per doc,
    * distinct-1 = |unique unigrams|/|unigrams| and distinct-2
    * likewise over adjacent bigrams; per source, the micro-quantized
    * integer average plus the corpus-level pooled ratio (unique
    * grams of the whole source over its token volume — the number
    * that drops when a generator repeats itself ACROSS docs, which
    * per-doc ratios cannot see).
    *
    * Exactness: every ratio is |distinct set| / count — two integers,
    * one micro-quantized division; per-source averages are integer
    * sums DIV counts.
    *
    * Scale shape: one tokenize pass; per-doc ratios come from
    * size(array_distinct(...)) map-side; the pooled leg is a
    * (source, gram) distinct + count — the vocab-aggregate envelope.
    */
  def evalDistinctN(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        Dedup.tokensCol(col("text")).as("ws"))
      .filter(size(col("ws")) >= 2)
    def bigrams(arr: Column) = transform(
      sequence(lit(1), size(arr) - 1),
      i => concat_ws(" ", element_at(arr, i), element_at(arr, i + 1)))
    val perDocD = base
      .select(col("doc_id"), col("source"), col("ws"),
        bigrams(col("ws")).as("b2"))
      .select(col("source"),
        floor(size(array_distinct(col("ws"))).cast("double") * 1e6
          / size(col("ws")) + lit(0.5)).cast("long").as("d1"),
        floor(size(array_distinct(col("b2"))).cast("double") * 1e6
          / size(col("b2")) + lit(0.5)).cast("long").as("d2"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        expr("CAST(sum(d1) AS BIGINT) DIV count(1)").as("distinct1_micro"),
        expr("CAST(sum(d2) AS BIGINT) DIV count(1)").as("distinct2_micro"))
    val pooled = base
      .select(col("source"), explode(col("ws")).as("g"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_tok"), countDistinct(col("g")).as("n_uniq"))
      .select(col("source"),
        floor(col("n_uniq").cast("double") * 1e6 / col("n_tok") + lit(0.5))
          .cast("long").as("pooled1_micro"))
    perDocD.join(pooled, "source")
  }

  /** pass@k sample budget. */
  val PassK = 10
  /** The heuristic gate pass@k measures yield against — BY REFERENCE
    * to the single stopword list and threshold the classifier distills
    * (no third private copy to drift when the gate is tuned).
    */
  private def SwList: Seq[String] = TextOps.StopwordsPub
  private def SwTau: Double = Classifier.SwTau

  /** pass@k (Chen et al. 2021) as a CURATION-YIELD metric: per
    * source, the probability that a uniform k-doc sample contains at
    * least one doc the heuristic quality gate accepts — the unbiased
    * estimator 1 − C(n−c, k)/C(n, k), exactly the statistic an eval
    * harness computes per problem from n samples with c passes (swap
    * the gate column for unit-test verdicts and this is the code-eval
    * pass@k, unchanged). Tells a pipeline how large a per-source
    * sample must be before it reliably sees usable text.
    *
    * Exactness: the binomial ratio unrolls to the k-term product
    * Π (n−c−i)/(n−i) — a FIXED left-associated chain of k IEEE
    * divisions and multiplies over exact integers, identical in both
    * engines, micro-quantized once. If the gate-failing pool is
    * smaller than k a factor hits exactly 0 and pass@k = 1 — the
    * estimator's own boundary semantics, no special-casing.
    *
    * Scale shape: one tokenize pass → per-source (n, c) cells —
    * a map-side-combinable aggregate; the product is per-CELL
    * arithmetic over |sources| rows.
    */
  def evalPassAtK(s: SparkSession, d: String): DataFrame = {
    val cells = Tables.documents(s, d)
      .select(col("source"), Dedup.tokensCol(col("text")).as("ws"))
      .select(col("source"), size(col("ws")).as("n_tok"),
        size(filter(col("ws"), w => w.isInCollection(SwList))).as("nsw"))
      .filter(col("n_tok") > 0)
      .select(col("source"),
        (col("nsw").cast("double") / col("n_tok") >= SwTau)
          .cast("long").as("acc"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("acc").as("n_pass"))
      .filter(col("n_docs") >= PassK)
    val prod = (0 until PassK).map { i =>
      (col("n_docs") - col("n_pass") - lit(i)).cast("double") /
        (col("n_docs") - lit(i)).cast("double")
    }.reduceLeft(_ * _)
    cells.select(col("source"), col("n_docs"), col("n_pass"),
      floor(col("n_pass").cast("double") / col("n_docs") * 1e6 + lit(0.5))
        .cast("long").as("pass1_micro"),
      floor((lit(1.0) - prod) * 1e6 + lit(0.5)).cast("long")
        .as("pass10_micro"))
  }

  /** DCG position weights w(i) = round(1e6/log2(i+1)) for ranks
    * 1..SearchTopK, and their prefix sums (the ideal-DCG table) —
    * embedded as literals in BOTH engines' plans, so no cross-engine
    * libm log enters the metric.
    */
  private val DcgW: IndexedSeq[Long] =
    (1 to TextOps.SearchTopK).map(i =>
      math.floor(1e6 / (math.log(i + 1.0) / math.log(2.0)) + 0.5).toLong)
  private val DcgCum: IndexedSeq[Long] = DcgW.scanLeft(0L)(_ + _).tail

  /** Ranking-quality eval of the BM25 retrieval path — MRR and
    * nDCG@k, the metrics a retrieval pipeline reports next to the
    * recall@k the ANN family already emits. Workload: each query
    * doc's 1st/3rd/5th tokens form a 3-key-term query; the GROUND
    * TRUTH for a query is the conjunctive match set (corpus docs
    * whose distinct-token set contains every distinct key term — the
    * boolean-retrieval oracle), and the SYSTEM under eval is the
    * shared BM25 ranker ([[TextOps.bm25RankedOn]]) run on the same
    * key terms. Binary gains: DCG = Σ_{relevant hits} w(rank),
    * IDCG = Σ_{i≤min(|rel|,k)} w(i), both integer sums of the literal
    * micro weight table, so MRR and nDCG are each ONE double division
    * micro-quantized — merge-order free.
    *
    * Scale shape: the ranker's index build is the search_bm25 plan
    * (token-linear, broadcast query side); the truth side is one
    * distinct-posting join pruned to the key terms' postings. Both
    * metric joins are id-keyed over O(queries·k) rows.
    */
  def searchRankEval(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val qkeys = docs.filter(col("doc_id") < TextOps.SearchQueryDocs)
      .select(col("doc_id").as("query_id"),
        Dedup.tokensCol(col("text")).as("ws"))
      .filter(size(col("ws")) >= 5)
      .select(col("query_id"), array(element_at(col("ws"), 1),
        element_at(col("ws"), 3), element_at(col("ws"), 5)).as("qs"))
    val qterms = qkeys.select(col("query_id"), explode(col("qs")).as("term"))
    val ranked = TextOps.bm25RankedOn(docs, qterms)
    val qset = qkeys
      .select(col("query_id"), explode(array_distinct(col("qs"))).as("term"))
    val nq = qset.groupBy("query_id").agg(count(lit(1)).as("n_terms"))
    val corpusTerms = docs.filter(col("doc_id") >= TextOps.SearchQueryDocs)
      .select(col("doc_id"),
        explode(array_distinct(Dedup.tokensCol(col("text")))).as("term"))
    val rel = corpusTerms.join(broadcast(qset), "term")
      .groupBy("query_id", "doc_id").agg(count(lit(1)).as("n_match"))
      .join(broadcast(nq), "query_id")
      .filter(col("n_match") === col("n_terms"))
      .select("query_id", "doc_id")
    val nrel = rel.groupBy("query_id").agg(count(lit(1)).as("n_rel"))
    val wArr = array(DcgW.map(lit).toIndexedSeq: _*)
    val cumArr = array(DcgCum.map(lit).toIndexedSeq: _*)
    val hits = ranked.join(rel, Seq("query_id", "doc_id"))
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_hits"), min("rk").as("fr"),
        sum(element_at(wArr, col("rk"))).as("dcg"))
    qkeys.select("query_id")
      .join(nrel, Seq("query_id"), "left")
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        coalesce(col("fr"), lit(0)).cast("int").as("first_rank"),
        when(col("fr").isNull, lit(0L))
          .otherwise(floor(lit(1e6) / col("fr") + lit(0.5)).cast("long"))
          .as("mrr_micro"),
        when(coalesce(col("n_rel"), lit(0L)) === 0, lit(0L))
          .otherwise(floor(coalesce(col("dcg"), lit(0L)).cast("double")
            * 1e6 / element_at(cumArr,
              least(col("n_rel"), lit(TextOps.SearchTopK.toLong)).cast("int"))
            + lit(0.5)).cast("long"))
          .as("ndcg_micro"))
  }

  /** PRF feedback depth and expansion-list size. */
  val PrfFbDocs = 3
  val PrfExpK = 5

  /** Pseudo-relevance-feedback query expansion (the RM3 recipe of
    * Lavrenko & Croft / Abdul-Jaleel et al., reduced to its
    * term-selection core): run the BM25 ranker, take each query's top
    * [[PrfFbDocs]] feedback docs, and mine the [[PrfExpK]] highest-
    * weight NEW terms from them (summed per-doc BM25 contribution,
    * original query terms anti-joined away). The emitted table is the
    * expansion artifact a retrieval stack feeds back into a second
    * round — and a corpus-health read on its own (junk expansion
    * terms = topically incoherent feedback docs).
    *
    * Exactness: weights are integer sums of the ranker's nano-int
    * contributions; ranking is (w_nano desc, term asc) — total, no
    * floats anywhere past the already-quantized index.
    *
    * Scale shape: one contrib-table build (the search_bm25 plan),
    * the O(queries·FbDocs) feedback spine joined id-keyed against the
    * contrib rows of just those docs, a broadcast anti-join on the
    * query terms, and a top-k window over O(queries · doc-vocab)
    * candidates.
    */
  def searchExpandPrf(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
    val qterms = TextOps.bm25DefaultQterms(docs)
    val contrib = TextOps.bm25ContribOn(docs)
    val top = TextOps.bm25RankedFrom(contrib, qterms)
      .filter(col("rk") <= PrfFbDocs).select("query_id", "doc_id")
    val cand = contrib.select("doc_id", "term", "cint")
      .join(top, "doc_id")
      .groupBy("query_id", "term").agg(sum("cint").as("w_nano"))
      .join(broadcast(qterms), Seq("query_id", "term"), "left_anti")
    cand.withColumn("rk", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("w_nano").desc, col("term").asc)))
      .filter(col("rk") <= PrfExpK)
      .select(col("query_id"), col("rk"), col("term"), col("w_nano"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "search_expand_prf" -> searchExpandPrf,
    "eval_rouge" -> evalRouge,
    "eval_bleu" -> evalBleu,
    "eval_chrf" -> evalChrf,
    "eval_pass_at_k" -> evalPassAtK,
    "eval_distinct_n" -> evalDistinctN,
    "search_rank_eval" -> searchRankEval)

  /** Shared per-doc CTE chain (DuckDB): lead/body split, both n-gram
    * orders, clipped matches via (doc, gram) joins.
    */
  private val PerDocDuck =
    """base AS (
      |  SELECT doc_id, source,
      |    CAST(ceil(len(ws) / 5.0) AS INTEGER) AS c_len,
      |    len(ws) - CAST(ceil(len(ws) / 5.0) AS INTEGER) AS b_len,
      |    ws[1 : CAST(ceil(len(ws) / 5.0) AS INTEGER)] AS lead,
      |    ws[CAST(ceil(len(ws) / 5.0) AS INTEGER) + 1 : len(ws)] AS body
      |  FROM (SELECT doc_id, source,
      |          list_filter(string_split_regex(text, '[^\p{L}]+'),
      |                      x -> len(x) > 0) AS ws
      |        FROM documents)
      |  WHERE len(ws) >= 10),
      |sides AS (
      |  SELECT doc_id, source, c_len, b_len, lead, body,
      |    list_transform(generate_series(1, len(lead) - 1),
      |      i -> lead[i] || ' ' || lead[i+1]) AS lead2,
      |    list_transform(generate_series(1, len(body) - 1),
      |      i -> body[i] || ' ' || body[i+1]) AS body2
      |  FROM base),
      |ca1 AS (SELECT doc_id, g, count(*) AS c
      |        FROM (SELECT doc_id, unnest(lead) AS g FROM sides) GROUP BY 1, 2),
      |cb1 AS (SELECT doc_id, g, count(*) AS c
      |        FROM (SELECT doc_id, unnest(body) AS g FROM sides) GROUP BY 1, 2),
      |ca2 AS (SELECT doc_id, g, count(*) AS c
      |        FROM (SELECT doc_id, unnest(lead2) AS g FROM sides) GROUP BY 1, 2),
      |cb2 AS (SELECT doc_id, g, count(*) AS c
      |        FROM (SELECT doc_id, unnest(body2) AS g FROM sides) GROUP BY 1, 2),
      |m1 AS (SELECT ca1.doc_id, CAST(sum(least(ca1.c, cb1.c)) AS BIGINT) AS m
      |       FROM ca1 JOIN cb1 ON ca1.doc_id = cb1.doc_id AND ca1.g = cb1.g
      |       GROUP BY 1),
      |m2 AS (SELECT ca2.doc_id, CAST(sum(least(ca2.c, cb2.c)) AS BIGINT) AS m
      |       FROM ca2 JOIN cb2 ON ca2.doc_id = cb2.doc_id AND ca2.g = cb2.g
      |       GROUP BY 1),
      |per_doc AS (
      |  SELECT s.doc_id, s.source, s.c_len, s.b_len,
      |    coalesce(m1.m, 0) AS m1, coalesce(m2.m, 0) AS m2
      |  FROM sides s
      |  LEFT JOIN m1 ON s.doc_id = m1.doc_id
      |  LEFT JOIN m2 ON s.doc_id = m2.doc_id)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "eval_rouge" ->
      s"""WITH $PerDocDuck
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(CAST(floor(CAST(m1 AS DOUBLE) / b_len * 1e6 + 0.5)
         |    AS BIGINT)) AS BIGINT) // count(*) AS rouge1_micro,
         |  CAST(sum(CAST(floor(CAST(m2 AS DOUBLE) / (b_len - 1) * 1e6 + 0.5)
         |    AS BIGINT)) AS BIGINT) // count(*) AS rouge2_micro
         |FROM per_doc GROUP BY source""".stripMargin,
    "search_expand_prf" ->
      ("WITH " + TextOps.searchBm25SqlCtes + s""",
        |top AS (SELECT query_id, doc_id FROM lex WHERE rk <= $PrfFbDocs),
        |cand AS (
        |  SELECT t.query_id, c.term, CAST(sum(c.cint) AS BIGINT) AS w_nano
        |  FROM c JOIN top t ON c.doc_id = t.doc_id
        |  GROUP BY 1, 2),
        |fresh AS (
        |  SELECT cand.query_id, cand.term, cand.w_nano
        |  FROM cand LEFT JOIN qd
        |    ON qd.query_id = cand.query_id AND qd.term = cand.term
        |  WHERE qd.term IS NULL)
        |SELECT query_id, rk, term, w_nano FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY w_nano DESC, term ASC) AS INTEGER) AS rk
        |  FROM fresh)
        |WHERE rk <= $PrfExpK""".stripMargin),
    "eval_distinct_n" ->
      """WITH base AS (
        |  SELECT doc_id, source, ws,
        |    list_transform(generate_series(1, len(ws) - 1),
        |      i -> ws[i] || ' ' || ws[i+1]) AS b2
        |  FROM (SELECT doc_id, source,
        |          list_filter(string_split_regex(text, '[^\p{L}]+'),
        |                      x -> len(x) > 0) AS ws
        |        FROM documents)
        |  WHERE len(ws) >= 2),
        |pd AS (
        |  SELECT source,
        |    CAST(floor(CAST(len(list_distinct(ws)) AS DOUBLE) * 1e6
        |      / len(ws) + 0.5) AS BIGINT) AS d1,
        |    CAST(floor(CAST(len(list_distinct(b2)) AS DOUBLE) * 1e6
        |      / len(b2) + 0.5) AS BIGINT) AS d2
        |  FROM base),
        |agg AS (
        |  SELECT source, count(*) AS n_docs,
        |    CAST(sum(d1) AS BIGINT) // count(*) AS distinct1_micro,
        |    CAST(sum(d2) AS BIGINT) // count(*) AS distinct2_micro
        |  FROM pd GROUP BY source),
        |pooled AS (
        |  SELECT source,
        |    CAST(floor(CAST(count(DISTINCT g) AS DOUBLE) * 1e6 / count(*)
        |      + 0.5) AS BIGINT) AS pooled1_micro
        |  FROM (SELECT source, unnest(ws) AS g FROM base)
        |  GROUP BY source)
        |SELECT agg.source, n_docs, distinct1_micro, distinct2_micro,
        |  pooled1_micro
        |FROM agg JOIN pooled ON agg.source = pooled.source""".stripMargin,
    "eval_pass_at_k" -> {
      val factors = (0 until PassK).map(i =>
        s"(CAST(n_docs - n_pass - $i AS DOUBLE) / CAST(n_docs - $i AS DOUBLE))")
        .mkString(" * ")
      s"""WITH cells AS (
         |  SELECT source, count(*) AS n_docs,
         |    CAST(sum(CASE WHEN CAST(len(list_filter(ws,
         |        x -> list_contains([${SwList.map(w => s"'$w'").mkString(",")}],
         |          x))) AS DOUBLE) / len(ws) >= $SwTau
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
         |  FROM (SELECT source,
         |          list_filter(string_split_regex(text, '[^\\p{L}]+'),
         |                      x -> len(x) > 0) AS ws
         |        FROM documents)
         |  WHERE len(ws) > 0
         |  GROUP BY source
         |  HAVING count(*) >= $PassK)
         |SELECT source, n_docs, n_pass,
         |  CAST(floor(CAST(n_pass AS DOUBLE) / n_docs * 1e6 + 0.5) AS BIGINT)
         |    AS pass1_micro,
         |  CAST(floor((1.0 - $factors) * 1e6 + 0.5) AS BIGINT)
         |    AS pass10_micro
         |FROM cells""".stripMargin
    },
    "eval_chrf" ->
      s"""WITH base AS (
         |  SELECT doc_id, source,
         |    array_to_string(ws[1 : CAST(ceil(len(ws) / 5.0) AS INTEGER)],
         |      ' ') AS cand,
         |    array_to_string(
         |      ws[CAST(ceil(len(ws) / 5.0) AS INTEGER) + 1 : len(ws)],
         |      ' ') AS ref
         |  FROM (SELECT doc_id, source,
         |          list_filter(string_split_regex(text, '[^\\p{L}]+'),
         |                      x -> len(x) > 0) AS ws
         |        FROM documents)
         |  WHERE len(ws) >= $MinTokens),
         |sides AS (
         |  SELECT doc_id, source,
         |    list_transform(generate_series(1, length(cand) - 1),
         |      i -> substr(cand, i, 2)) AS c2,
         |    list_transform(generate_series(1, length(ref) - 1),
         |      i -> substr(ref, i, 2)) AS r2,
         |    list_transform(generate_series(1, length(cand) - 2),
         |      i -> substr(cand, i, 3)) AS c3,
         |    list_transform(generate_series(1, length(ref) - 2),
         |      i -> substr(ref, i, 3)) AS r3
         |  FROM base),
         |cc2 AS (SELECT doc_id, g, count(*) AS c
         |        FROM (SELECT doc_id, unnest(c2) AS g FROM sides)
         |        GROUP BY 1, 2),
         |cr2 AS (SELECT doc_id, g, count(*) AS c
         |        FROM (SELECT doc_id, unnest(r2) AS g FROM sides)
         |        GROUP BY 1, 2),
         |cc3 AS (SELECT doc_id, g, count(*) AS c
         |        FROM (SELECT doc_id, unnest(c3) AS g FROM sides)
         |        GROUP BY 1, 2),
         |cr3 AS (SELECT doc_id, g, count(*) AS c
         |        FROM (SELECT doc_id, unnest(r3) AS g FROM sides)
         |        GROUP BY 1, 2),
         |m2 AS (SELECT cc2.doc_id, CAST(sum(least(cc2.c, cr2.c)) AS BIGINT) AS m
         |       FROM cc2 JOIN cr2 ON cc2.doc_id = cr2.doc_id AND cc2.g = cr2.g
         |       GROUP BY 1),
         |m3 AS (SELECT cc3.doc_id, CAST(sum(least(cc3.c, cr3.c)) AS BIGINT) AS m
         |       FROM cc3 JOIN cr3 ON cc3.doc_id = cr3.doc_id AND cc3.g = cr3.g
         |       GROUP BY 1),
         |f AS (
         |  SELECT s.source,
         |    CAST(floor(5.0 * coalesce(m2.m, 0) * 1e6
         |      / (len(s.c2) + 4 * len(s.r2)) + 0.5) AS BIGINT) AS f2,
         |    CAST(floor(5.0 * coalesce(m3.m, 0) * 1e6
         |      / (len(s.c3) + 4 * len(s.r3)) + 0.5) AS BIGINT) AS f3
         |  FROM sides s
         |  LEFT JOIN m2 ON s.doc_id = m2.doc_id
         |  LEFT JOIN m3 ON s.doc_id = m3.doc_id)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(f2) AS BIGINT) // count(*) AS chrf2_micro,
         |  CAST(sum(f3) AS BIGINT) // count(*) AS chrf3_micro,
         |  CAST(sum((f2 + f3 + 1) // 2) AS BIGINT) // count(*) AS chrf_micro
         |FROM f GROUP BY source""".stripMargin,
    "search_rank_eval" -> {
      val K = TextOps.SearchTopK
      val qdCtes =
        s"""qk AS (
           |  SELECT doc_id AS query_id, ws[1] AS w1, ws[3] AS w3, ws[5] AS w5
           |  FROM (SELECT doc_id, ${TextOps.tokSqlDuck} AS ws FROM documents
           |        WHERE doc_id < ${TextOps.SearchQueryDocs})
           |  WHERE len(ws) >= 5),
           |qd AS (SELECT query_id, unnest([w1, w3, w5]) AS term FROM qk)""".stripMargin
      s"""WITH ${TextOps.searchBm25SqlCtesWith(qdCtes)},
         |qset AS (SELECT DISTINCT query_id, term FROM qd),
         |nq AS (SELECT query_id, count(*) AS n_terms FROM qset GROUP BY 1),
         |ct AS (SELECT doc_id, unnest(list_distinct(${TextOps.tokSqlDuck}))
         |         AS term
         |       FROM documents WHERE doc_id >= ${TextOps.SearchQueryDocs}),
         |relc AS (SELECT q.query_id, ct.doc_id, count(*) AS n_match
         |         FROM ct JOIN qset q USING (term) GROUP BY 1, 2),
         |rel AS (SELECT relc.query_id, relc.doc_id
         |        FROM relc JOIN nq USING (query_id)
         |        WHERE n_match = n_terms),
         |nrel AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_rel
         |         FROM rel GROUP BY 1),
         |wt AS (SELECT unnest(generate_series(1, $K)) AS rk,
         |         unnest([${DcgW.mkString(", ")}]) AS w,
         |         unnest([${DcgCum.mkString(", ")}]) AS cw),
         |hits AS (
         |  SELECT l.query_id, CAST(count(*) AS BIGINT) AS n_hits,
         |    CAST(min(l.rk) AS INTEGER) AS fr,
         |    CAST(sum(wt.w) AS BIGINT) AS dcg
         |  FROM lex l JOIN rel USING (query_id, doc_id)
         |  JOIN wt ON wt.rk = l.rk
         |  GROUP BY 1)
         |SELECT qk.query_id,
         |  coalesce(nrel.n_rel, 0) AS n_rel,
         |  coalesce(hits.n_hits, 0) AS n_hits,
         |  CAST(coalesce(hits.fr, 0) AS INTEGER) AS first_rank,
         |  CASE WHEN hits.fr IS NULL THEN 0
         |       ELSE CAST(floor(1e6 / hits.fr + 0.5) AS BIGINT)
         |  END AS mrr_micro,
         |  CASE WHEN coalesce(nrel.n_rel, 0) = 0 THEN 0
         |       ELSE CAST(floor(CAST(coalesce(hits.dcg, 0) AS DOUBLE) * 1e6
         |         / (SELECT cw FROM wt
         |            WHERE rk = least(nrel.n_rel, $K)) + 0.5) AS BIGINT)
         |  END AS ndcg_micro
         |FROM qk LEFT JOIN nrel USING (query_id)
         |LEFT JOIN hits USING (query_id)""".stripMargin
    },
    "eval_bleu" ->
      s"""WITH $PerDocDuck
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(CAST(floor(CAST(m1 AS DOUBLE) / c_len * 1e6 + 0.5)
         |    AS BIGINT)) AS BIGINT) // count(*) AS p1_micro,
         |  CAST(sum(CAST(floor(CAST(m2 AS DOUBLE) / (c_len - 1) * 1e6 + 0.5)
         |    AS BIGINT)) AS BIGINT) // count(*) AS p2_micro,
         |  CAST(sum(CAST(floor(exp(1.0 - CAST(b_len AS DOUBLE) / c_len)
         |    * sqrt((CAST(m1 AS DOUBLE) / c_len)
         |      * (CAST(m2 AS DOUBLE) / (c_len - 1))) * 1e6 + 0.5)
         |    AS BIGINT)) AS BIGINT) // count(*) AS bleu2_micro
         |FROM per_doc GROUP BY source""".stripMargin)
}
