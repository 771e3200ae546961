package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Corpus-curation operators for training-data assembly ([EXT]): the
  * pipeline steps that sit BETWEEN cleaning/dedup and the trainer —
  * chunking documents into context windows, building the training
  * order, realizing mix weights into concrete epochs, vocabulary
  * coverage feedback for tokenizer design, and per-source token-budget
  * capping.
  *
  * Every operator here is linear and shuffle-light by construction:
  * chunking and epoch realization are pure map+explode (zero shuffle),
  * the shuffle/cap passes use per-shard / per-source windows (bounded
  * partitions, no global single-partition window), and vocabulary
  * coverage shuffles only (term, count) pairs — vocabulary-cardinality,
  * not corpus-cardinality. All randomness is md5-derived from row keys
  * (the [[TextOps.sampleWeighted]] convention), so results are
  * deterministic across engines, retries, and cluster sizes.
  */
object Curation {

  /** Context-window length (tokens) for [[chunkText]]. */
  val ChunkLen = 64

  /** Chunk stride: consecutive windows overlap by ChunkLen−ChunkStride
    * tokens so no span longer than the overlap is ever split unseen.
    */
  val ChunkStride = 48

  /** Training-order shard count for [[shuffleOrder]]. At 100 TB this is
    * the writer parallelism — thousands; the per-shard window cost is
    * corpus/shards regardless of the constant.
    */
  val NShards = 8

  /** Top-V vocabulary size for [[vocabCoverage]]. */
  val VocabSize = 50

  /** Curriculum phase count for [[curriculumOrder]]. */
  val Phases = 5

  /** Per-source token budget for [[capSourceTokens]]. Fixed per SOURCE,
    * not per corpus — the cap semantics are SF-independent.
    */
  val TokenBudget = 1500

  private def wsTokens(text: Column): Column =
    filter(split(text, "\\s+"), w => length(w) > 0)

  /** 48 hex-derived bits + 0.5 over 2^48: u ∈ (0,1), exact in double
    * and bit-identical in any engine with md5 (sampleWeighted pattern).
    */
  private def mdUniform(prefix: String, key: Column): Column =
    (conv(substring(md5(concat(lit(prefix), key.cast("string"))), 1, 12),
      16, 10).cast("double") + lit(0.5)) / lit(281474976710656.0)

  /** Fixed-size overlapping context-window chunking — the pretraining /
    * RAG document splitter. Emits one row per (doc, window) with the
    * window's token count and content digest; window w covers tokens
    * [w·stride, w·stride+len). Pure map + explode over one scan: zero
    * shuffle, embarrassingly parallel, output ∝ input tokens — the
    * shape that survives 100 TB unchanged. Digests (not chunk text)
    * keep the output row narrow; a writer variant would keep the text.
    */
  def chunkText(s: SparkSession, d: String): DataFrame =
    chunkTextOn(Tables.documents(s, d))

  /** [[chunkText]] over any frame with (doc_id, text) — the form
    * composed pipelines reuse (Pipeline.pipelinePretrain).
    */
  def chunkTextOn(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), wsTokens(col("text")).as("ws"))
      .select(col("doc_id"), col("ws"), size(col("ws")).as("n"))
      .where(col("n") > 0)
      .select(col("doc_id"), col("n"), col("ws"),
        explode(sequence(lit(0), col("n") - 1, lit(ChunkStride))).as("start"))
      .select(
        col("doc_id"),
        (col("start") / ChunkStride).cast("int").as("chunk_id"),
        least(lit(ChunkLen), col("n") - col("start")).cast("int").as("chunk_tokens"),
        md5(array_join(slice(col("ws"), col("start") + 1, lit(ChunkLen)), " "))
          .as("chunk_digest"))

  /** Deterministic global training-order shuffle + shard assignment:
    * shard = 24 md5 bits mod NShards, position = rank of the full md5
    * key within the shard. Seeded by the key prefix, so the order is
    * reproducible across runs, engines, and cluster sizes — the
    * property a resumable training job needs. The window partitions by
    * shard (never a global single-partition sort); at scale each shard
    * sorts corpus/NShards keys, standard range-partitioned sort work.
    */
  def shuffleOrder(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("shard").orderBy(col("shuffle_key"), col("doc_id"))
    Tables.documents(s, d)
      .select(col("doc_id"),
        md5(concat(lit("shuf:"), col("doc_id").cast("string"))).as("shuffle_key"))
      .withColumn("shard",
        pmod(conv(substring(col("shuffle_key"), 1, 6), 16, 10).cast("long"),
          lit(NShards)).cast("int"))
      .withColumn("pos", row_number().over(w))
      .select(col("doc_id"), col("shard"), col("pos"), col("shuffle_key"))
  }

  /** Top-V vocabulary coverage: build the corpus-global top-V token
    * vocabulary (count desc, token asc — fully ordered, so the V-th
    * boundary is deterministic) and report each language's
    * out-of-vocabulary token rate — the feedback number tokenizer
    * sizing decisions are made on. Only (term, count) pairs shuffle
    * (vocabulary cardinality); the vocabulary itself is a broadcast
    * membership probe; the per-language tail is a partial-agg'd
    * 5-row aggregate.
    */
  def vocabCoverage(s: SparkSession, d: String): DataFrame = {
    val tok = Tables.documents(s, d)
      .select(col("lang"), explode(Dedup.tokensCol(col("text"))).as("term"))
    val vocab = tok.groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term").asc)
      .limit(VocabSize)
    tok.join(broadcast(vocab.select(col("term"), lit(1).as("in_vocab"))),
        Seq("term"), "left")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1).otherwise(0)).as("oov_tokens"))
      .select(col("lang"), col("n_tokens"), col("oov_tokens"),
        (floor(col("oov_tokens").cast("double") / col("n_tokens") * 10000 + 0.5)
          / 10000.0).as("oov_rate"))
  }

  /** Realize [[Corpus.sourceMix]]'s uniform-token-mass weights into
    * concrete training copies — the epoch materialization step. Each
    * doc in source s with weight w gets ⌊w⌋ copies plus one more when
    * its md5-uniform is below frac(w), so every source's expected token
    * mass equalizes while staying reproducible doc-by-doc (no RNG
    * state, survives retries). Per-source weights are a broadcast
    * 20-row frame; the corpus side is one map + explode — linear,
    * zero data shuffle.
    */
  /** Curriculum-ordered training schedule: docs are bucketed into
    * [[Phases]] quality phases (phase 0 = cleanest, trained first —
    * fixed thresholds on the [[TextOps.qualityScore]] composite, so
    * phasing is a pure MAP, not a global ntile sort), then
    * deterministically shuffled within phase and assigned to shards
    * ([[shuffleOrder]]'s md5 conventions). `pos` is the per-shard
    * training position ordered by (phase, shuffle_key) — each shard
    * streams its cleanest docs first, randomized within a phase,
    * reproducible across runs/engines/cluster sizes.
    *
    * Scale: quality + phase + shard are map-only; the only shuffle is
    * the per-shard rank window (corpus/shards rows per partition, the
    * shuffleOrder bound).
    */
  def curriculumOrder(s: SparkSession, d: String): DataFrame = {
    val stopArr = array(Seq("the", "a", "of", "and", "to", "in", "is", "it").map(lit): _*)
    val ws = col("ws")
    val nTok = size(ws)
    val punct = length(regexp_replace(col("text"), "[\\p{L}\\p{N}\\s]", ""))
    val stopRatio = size(filter(ws, w => array_contains(stopArr, w))).cast("double") / nTok
    val punctRatio = punct.cast("double") / length(col("text"))
    // EXACTLY TextOps.qualityScore's floor-rounded composite
    val quality = floor((stopRatio * 0.4 + least(nTok / lit(100.0), lit(1.0)) * 0.3
      + (lit(1.0) - punctRatio) * 0.3) * 10000 + 0.5) / 10000.0
    val w = Window.partitionBy("shard").orderBy(col("phase"), col("shuffle_key"), col("doc_id"))
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"), Dedup.tokensCol(col("text")).as("ws"))
      .where(size(ws) > 0)
      .select(col("doc_id"), quality.as("quality"),
        md5(concat(lit("cur:"), col("doc_id").cast("string"))).as("shuffle_key"))
      .withColumn("shard",
        pmod(conv(substring(col("shuffle_key"), 1, 6), 16, 10).cast("long"),
          lit(NShards)).cast("int"))
      .withColumn("phase",
        least(floor((lit(1.0) - col("quality")) * lit(Phases)), lit((Phases - 1).toDouble))
          .cast("int"))
      .withColumn("pos", row_number().over(w))
      .select(col("doc_id"), col("phase"), col("shard"), col("pos"))
  }

  def mixEpochs(s: SparkSession, d: String): DataFrame = {
    val perSource = Tables.documents(s, d)
      .select(col("source"), size(Dedup.tokensCol(col("text"))).as("ntok"))
      .groupBy("source").agg(sum("ntok").as("n_tokens"))
    val totals = perSource.agg(
      sum("n_tokens").as("total_tokens"), count(lit(1)).as("n_sources"))
    val weight = (col("total_tokens").cast("double") / col("n_sources")) / col("n_tokens")
    val weights = perSource.crossJoin(broadcast(totals))
      .select(col("source"), weight.as("w"))
    val u = mdUniform("mix:", col("doc_id"))
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"))
      .join(broadcast(weights), Seq("source"))
      .withColumn("n_copies",
        (floor(col("w")) +
          when(u < (col("w") - floor(col("w"))), 1).otherwise(0)).cast("int"))
      .where(col("n_copies") > 0)
      .select(col("doc_id"), col("source"),
        explode(sequence(lit(1), col("n_copies"))).as("copy"))
  }

  /** Per-source token-budget cap in ingest order: running token sum per
    * source (doc_id order = arrival order), docs past the budget are
    * flagged dropped — the quota gate that stops one crawl dump from
    * dominating the mix. Emits the full audit trail (cumulative count +
    * kept flag) rather than silently filtering. Sources are FEW and
    * populations huge, so the running sum is a ScalableRank grouped
    * prefix sum (one range-partitioned global (source, doc_id) sort +
    * per-source offsets), never a per-source window partition that
    * would put a whole crawl dump on one core.
    */
  def capSourceTokens(s: SparkSession, d: String): DataFrame =
    graft.core.ScalableRank.groupedPrefixSums(
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          size(Dedup.tokensCol(col("text"))).as("n_tokens"))
        .withColumn("__nt", col("n_tokens").cast("long")),
      "source", Seq("__nt"), Seq("cum_tokens"), col("doc_id").asc)
      .select(col("doc_id"), col("source"), col("n_tokens"), col("cum_tokens"),
        when(col("cum_tokens") <= TokenBudget, 1).otherwise(0).as("kept"))

  /** Token budget apportioned by [[mixtureAllocate]]. */
  val MixBudget = 1000000L

  /** Source-mixture budget apportionment ([EXT]) — Hamilton's
    * largest-remainder method over temperature-flattened source
    * weights: w_i = floor(√tokens_i · 1e6) (τ=2 flattening, the
    * mix_temperature convention), quota = B·w_i div Σw, and the
    * residual seats go to the largest remainders (B·w_i mod Σw,
    * ties → source asc). Allocations sum to the budget EXACTLY — the
    * property the naive per-source rounding loses and the reason
    * apportionment is its own operator. All integer: √ of an int64 is
    * one correctly-rounded IEEE op, identical in both engines.
    *
    * Scale shape: one tokenize pass to source-bounded cells;
    * everything after is |sources|-row arithmetic and one rank
    * window on that frame.
    */
  def mixtureAllocate(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val cells = Tables.documents(s, d)
      .select(col("source"), size(Dedup.tokensCol(col("text")))
        .cast("long").as("t"))
      .groupBy("source").agg(sum("t").as("n_tokens"))
      .withColumn("w", floor(sqrt(col("n_tokens").cast("double"))
        * 1000000 + lit(0.5)).cast("long"))
    val allW = w.partitionBy()
    val rkW = w.orderBy(expr(s"($MixBudget * w) % sw").desc, col("source").asc)
    cells
      .withColumn("sw", sum("w").over(allW))
      .withColumn("quota", expr(s"$MixBudget * w div sw"))
      .withColumn("resid_rank", row_number().over(rkW).cast("long"))
      .withColumn("n_resid",
        lit(MixBudget) - sum("quota").over(allW))
      .select(col("source"), col("n_tokens"), col("w"), col("quota"),
        col("resid_rank"),
        (col("quota") + when(col("resid_rank") <= col("n_resid"), 1L)
          .otherwise(0L)).as("alloc_tokens"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mixture_allocate" -> mixtureAllocate,
    "chunk_text" -> chunkText,
    "shuffle_order" -> shuffleOrder,
    "curriculum_order" -> curriculumOrder,
    "vocab_coverage" -> vocabCoverage,
    "mix_epochs" -> mixEpochs,
    "cap_source_tokens" -> capSourceTokens)

  // Letter-token twin of Dedup.tokensCol (shared with TextOps oracles).
  private val tokSqlDuck =
    "list_filter(string_split_regex(text, '[^\\p{L}]+'), x -> len(x) > 0)"

  def oracleSql: Map[String, String] = Map(
    "mixture_allocate" ->
      s"""WITH cells AS (
         |  SELECT source, CAST(sum(len($tokSqlDuck)) AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY source),
         |ww AS (
         |  SELECT source, n_tokens,
         |    CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000 + 0.5)
         |      AS BIGINT) AS w
         |  FROM cells),
         |ext AS (
         |  SELECT source, n_tokens, w,
         |    CAST(sum(w) OVER () AS BIGINT) AS sw
         |  FROM ww),
         |q AS (
         |  SELECT source, n_tokens, w,
         |    CAST($MixBudget * w // sw AS BIGINT) AS quota,
         |    CAST(row_number() OVER (ORDER BY ($MixBudget * w) % sw DESC,
         |      source ASC) AS BIGINT) AS resid_rank
         |  FROM ext)
         |SELECT source, n_tokens, w, quota, resid_rank,
         |  quota + CASE WHEN resid_rank <=
         |      $MixBudget - (SELECT sum(quota) FROM q)
         |    THEN 1 ELSE 0 END AS alloc_tokens
         |FROM q""".stripMargin,
    "chunk_text" ->
      s"""WITH t AS (SELECT doc_id,
         |             list_filter(string_split_regex(text, '\\s+'),
         |                         x -> len(x) > 0) AS ws
         |           FROM documents),
         |n AS (SELECT doc_id, ws, len(ws) AS n FROM t WHERE len(ws) > 0),
         |c AS (SELECT doc_id, n, ws,
         |        unnest(generate_series(0, n - 1, $ChunkStride)) AS start
         |      FROM n)
         |SELECT doc_id,
         |  CAST(start // $ChunkStride AS INTEGER) AS chunk_id,
         |  CAST(least($ChunkLen, n - start) AS INTEGER) AS chunk_tokens,
         |  md5(array_to_string(
         |        list_slice(ws, start + 1, start + $ChunkLen), ' ')) AS chunk_digest
         |FROM c""".stripMargin,
    "curriculum_order" ->
      s"""WITH t AS (SELECT doc_id, text, $tokSqlDuck AS ws FROM documents),
         |m AS (SELECT doc_id,
         |  CAST(len(ws) AS INTEGER) AS n_tokens,
         |  CAST(length(regexp_replace(text, '[\\p{L}\\p{N}\\s]', '', 'g')) AS DOUBLE) AS punct,
         |  CAST(length(text) AS INTEGER) AS n_chars,
         |  CAST(len(list_filter(ws, x -> list_contains(['the','a','of','and','to','in','is','it'], x))) AS DOUBLE) AS nstop
         |  FROM t WHERE len(ws) > 0),
         |q AS (SELECT doc_id,
         |  floor(((nstop / n_tokens) * 0.4 + least(n_tokens / 100.0, 1.0) * 0.3
         |        + (1.0 - punct / n_chars) * 0.3) * 10000 + 0.5) / 10000.0 AS quality
         |  FROM m),
         |k AS (SELECT doc_id, quality,
         |        md5('cur:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
         |      FROM q),
         |s AS (SELECT doc_id, shuffle_key,
         |        CAST(('0x' || substr(shuffle_key, 1, 6))::UBIGINT % $NShards
         |             AS INTEGER) AS shard,
         |        CAST(least(floor((1.0 - quality) * $Phases), ${Phases - 1}.0)
         |             AS INTEGER) AS phase
         |      FROM k)
         |SELECT doc_id, phase, shard,
         |  CAST(row_number() OVER (PARTITION BY shard
         |                          ORDER BY phase, shuffle_key, doc_id) AS INTEGER) AS pos
         |FROM s""".stripMargin,
    "shuffle_order" ->
      s"""WITH k AS (SELECT doc_id,
         |             md5('shuf:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
         |           FROM documents),
         |s AS (SELECT doc_id, shuffle_key,
         |        CAST(('0x' || substr(shuffle_key, 1, 6))::UBIGINT % $NShards
         |             AS INTEGER) AS shard
         |      FROM k)
         |SELECT doc_id, shard,
         |  CAST(row_number() OVER (PARTITION BY shard
         |                          ORDER BY shuffle_key, doc_id) AS INTEGER) AS pos,
         |  shuffle_key
         |FROM s""".stripMargin,
    "vocab_coverage" ->
      s"""WITH tok AS (SELECT lang, unnest($tokSqlDuck) AS term FROM documents),
         |v AS (SELECT term FROM (SELECT term, count(*) AS cnt FROM tok
         |                        GROUP BY 1 ORDER BY cnt DESC, term
         |                        LIMIT $VocabSize)),
         |j AS (SELECT lang,
         |        CASE WHEN term IN (SELECT term FROM v) THEN 0 ELSE 1 END AS oov
         |      FROM tok)
         |SELECT lang, count(*) AS n_tokens,
         |  CAST(sum(oov) AS BIGINT) AS oov_tokens,
         |  floor(CAST(sum(oov) AS DOUBLE) / count(*) * 10000 + 0.5) / 10000.0
         |    AS oov_rate
         |FROM j GROUP BY lang""".stripMargin,
    "mix_epochs" ->
      s"""WITH ps AS (SELECT source,
         |              CAST(sum(len($tokSqlDuck)) AS BIGINT) AS n_tokens
         |            FROM documents GROUP BY source),
         |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         |               count(*) AS n_sources FROM ps),
         |w AS (SELECT source,
         |        (CAST(total_tokens AS DOUBLE) / n_sources) / n_tokens AS w
         |      FROM ps CROSS JOIN tot),
         |docs AS (SELECT doc_id, d.source, w.w,
         |           (('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 12))::UBIGINT
         |            + 0.5) / 281474976710656.0 AS u
         |         FROM documents d JOIN w ON d.source = w.source),
         |c AS (SELECT doc_id, source,
         |        CAST(floor(w) + CASE WHEN u < w - floor(w) THEN 1 ELSE 0 END
         |             AS INTEGER) AS n_copies
         |      FROM docs)
         |SELECT doc_id, source,
         |  CAST(unnest(generate_series(1, n_copies)) AS INTEGER) AS copy
         |FROM c WHERE n_copies > 0""".stripMargin,
    "cap_source_tokens" ->
      s"""WITH t AS (SELECT doc_id, source,
         |             CAST(len($tokSqlDuck) AS INTEGER) AS n_tokens
         |           FROM documents),
         |c AS (SELECT doc_id, source, n_tokens,
         |        CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
         |               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
         |      FROM t)
         |SELECT doc_id, source, n_tokens, cum_tokens,
         |  CASE WHEN cum_tokens <= $TokenBudget THEN 1 ELSE 0 END AS kept
         |FROM c""".stripMargin)
}
