package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Deterministic MLM masking ([EXT]) — the BERT-style 80/10/10
  * corruption pass (Devlin et al. '18) with every random draw
  * replaced by the md5 shard-key convention, so the masked corpus is
  * reproducible across runs, engines, and backfills (the property a
  * training pipeline needs for resumable preprocessing; T5 span
  * corruption's sibling, token-level instead of span-level):
  * position p of doc d is selected when md5("mlm:d:p") mod 100 < 15;
  * selected positions mask (<12), keep (=12..13), or replace with an
  * md5-chosen token drawn from the document's own token list.
  *
  * Scale shape: one tokenize pass, map-only — the per-position
  * decisions and the rebuild are array expressions; no shuffle, no
  * vocabulary broadcast (in-doc replacement sampling by design).
  */
object Mlm {

  /** Selection threshold: md5 mod 100 < 15 ⇒ 15% of positions. */
  val SelectPct = 15L
  /** Of selected: < 12 mask (80%), 12..13 keep (13.3%), else replace. */
  val MaskPct = 12L
  val KeepPct = 14L

  def mlmMask(s: SparkSession, d: String): DataFrame = {
    def hashMod(prefix: String, modExpr: String) =
      s"""pmod(conv(substring(md5(concat('$prefix:',
         | cast(doc_id as string), ':', cast(i0 + 1 as string))),
         | 1, 6), 16, 10), $modExpr)""".stripMargin.replace("\n", "")
    val sel = hashMod("mlm", "100L")
    val rep = hashMod("rep", "cast(size(ws) as bigint)")
    val mt =
      s"""transform(ws, (w, i0) -> CASE
         | WHEN $sel < ${MaskPct}L THEN '[MASK]'
         | WHEN $sel < ${KeepPct}L THEN w
         | WHEN $sel < ${SelectPct}L THEN
         |   element_at(ws, cast($rep as int) + 1)
         | ELSE w END)""".stripMargin.replace("\n", "")
    Tables.documents(s, d)
      .select(col("doc_id"), Dedup.tokensCol(col("text")).as("ws"))
      .filter(size(col("ws")) > 0)
      .select(col("doc_id"), col("ws"), expr(mt).as("mt"))
      .select(col("doc_id"),
        size(col("ws")).cast("long").as("n_tokens"),
        expr("size(filter(mt, w -> w = '[MASK]'))").cast("long")
          .as("n_masked"),
        concat_ws(" ", col("mt")).as("masked_text"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mlm_mask" -> mlmMask)

  def oracleSql: Map[String, String] = Map(
    "mlm_mask" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex(text, '[^\\p{L}]+'),
         |                x -> len(x) > 0) AS ws
         |  FROM documents),
         |cells AS (
         |  SELECT doc_id, ws, i, ws[i] AS w,
         |    ('0x' || substr(md5('mlm:' || CAST(doc_id AS VARCHAR) || ':'
         |      || CAST(i AS VARCHAR)), 1, 6))::UBIGINT % 100 AS r,
         |    ('0x' || substr(md5('rep:' || CAST(doc_id AS VARCHAR) || ':'
         |      || CAST(i AS VARCHAR)), 1, 6))::UBIGINT % len(ws) AS ri
         |  FROM t, unnest(generate_series(1, len(ws))) AS u(i)
         |  WHERE len(ws) > 0),
         |masked AS (
         |  SELECT doc_id, i,
         |    CASE WHEN r < $MaskPct THEN '[MASK]'
         |         WHEN r < $KeepPct THEN w
         |         WHEN r < $SelectPct THEN ws[CAST(ri AS INTEGER) + 1]
         |         ELSE w END AS mw
         |  FROM cells)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |  CAST(sum(CASE WHEN mw = '[MASK]' THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_masked,
         |  string_agg(mw, ' ' ORDER BY i) AS masked_text
         |FROM masked GROUP BY doc_id""".stripMargin)
}
