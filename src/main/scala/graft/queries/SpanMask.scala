package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** T5-style span corruption (Raffel et al. 2020): turn each document
  * into a (corrupted input, denoising target) training pair — masked
  * spans are replaced by numbered sentinels in the input, and the
  * target lists each sentinel followed by the tokens it hid.
  *
  * The original samples spans at random; a distributed pipeline wants
  * the choice REPRODUCIBLE (re-runs and the train/eval split must see
  * identical pairs), so span selection here is hash-derived: the token
  * stream partitions into fixed blocks of 5, and a block is masked
  * iff md5(doc_id-block) ≡ 0 (mod 4) — ~25% of blocks, span = the
  * block's first 2 tokens, spans non-overlapping by construction
  * (no sequential greedy conflict resolution, which would not
  * parallelize). md5 reproduces bit-for-bit in DuckDB, so the full
  * string surgery sits under the hash-compare gate.
  *
  * Scale: pure map — one tokenize, all array ops per-row, zero
  * shuffles; the natural inline stage before pack_sequences.
  */
object SpanMask {

  private val B = 5       // block width (tokens)
  private val SpanLen = 2 // masked prefix per selected block
  private val Mod = 4     // 1-in-4 blocks masked

  private def toks(c: Column): Column =
    filter(split(c, "[^\\p{L}]+"), w => length(w) > 0)

  /** 32-bit md5 chunk of "docId-block" — the span selector. */
  private def blockHash(docId: Column, b: Column): Column =
    conv(substring(md5(concat(docId.cast("string"), lit("-"), b.cast("string"))),
      1, 8), 16, 10).cast("long")

  def maskSpans(s: SparkSession, d: String): DataFrame = {
    val ws = col("ws")
    val n = size(ws)
    val nb = floor(n / B).cast("int")
    val mb = filter(sequence(lit(1), nb),
      b => blockHash(col("doc_id"), b) % Mod === 0)
    // input: walk every token position; span starts become sentinels,
    // span tails vanish, the rest pass through
    val pieces = transform(sequence(lit(1), n), i => {
      val block = ceil(i.cast("double") / B).cast("int")
      val off = (i - 1) % B
      val inMasked = array_contains(mb, block) && off < SpanLen
      val k = array_position(mb, block) // 1-based sentinel number
      when(inMasked && off === 0, concat(lit("<X_"), k.cast("string"), lit(">")))
        .when(inMasked, lit(""))
        .otherwise(element_at(ws, i))
    })
    val inputText = array_join(filter(pieces, p => p =!= ""), " ")
    // target: <X_k> tok1 tok2 per masked block, in order. Guarded:
    // Spark's sequence(1, 0) is DESCENDING [1, 0] (not empty like
    // DuckDB's generate_series), so an unguarded transform would
    // element_at into the empty mb
    val targetText = when(size(mb) > 0,
      array_join(transform(sequence(lit(1), size(mb)), k =>
        concat(lit("<X_"), k.cast("string"), lit("> "),
          element_at(ws, (element_at(mb, k) - 1) * B + 1), lit(" "),
          element_at(ws, (element_at(mb, k) - 1) * B + 2))), " "))
      .otherwise(lit(""))
    Tables.documents(s, d)
      .select(col("doc_id"), toks(col("text")).as("ws"))
      .select(col("doc_id"), size(mb).cast("long").as("n_masked"),
        inputText.as("input_text"), targetText.as("target_text"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mask_spans" -> maskSpans)

  def oracleSql: Map[String, String] = Map(
    "mask_spans" ->
      s"""WITH tok AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex(text, '[^\\p{L}]+'), x -> len(x) > 0) AS w
         |  FROM documents),
         |sel AS (
         |  SELECT doc_id, w,
         |    list_filter(generate_series(1, CAST(floor(len(w) / $B) AS BIGINT)),
         |      b -> CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '-'
         |             || CAST(b AS VARCHAR)), 1, 8)) AS BIGINT) % $Mod = 0) AS mb
         |  FROM tok),
         |built AS (
         |  SELECT doc_id, CAST(len(mb) AS BIGINT) AS n_masked,
         |    array_to_string(list_filter(
         |      list_transform(generate_series(1, len(w)), i ->
         |        CASE
         |          WHEN list_contains(mb, CAST(ceil(CAST(i AS DOUBLE) / $B) AS BIGINT))
         |               AND (i - 1) % $B < $SpanLen THEN
         |            CASE WHEN (i - 1) % $B = 0 THEN
         |              '<X_' || CAST(list_position(mb,
         |                CAST(ceil(CAST(i AS DOUBLE) / $B) AS BIGINT)) AS VARCHAR) || '>'
         |            ELSE '' END
         |          ELSE w[i] END),
         |      p -> p <> ''), ' ') AS input_text,
         |    CASE WHEN len(mb) > 0 THEN
         |      array_to_string(list_transform(generate_series(1, len(mb)), k ->
         |        '<X_' || CAST(k AS VARCHAR) || '> '
         |          || w[(mb[k] - 1) * $B + 1] || ' ' || w[(mb[k] - 1) * $B + 2]),
         |        ' ')
         |    ELSE '' END AS target_text
         |  FROM sel)
         |SELECT doc_id, n_masked, input_text, target_text FROM built""".stripMargin)
}
