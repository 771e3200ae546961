package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Fuzzy (approximate-string) matching [EXT] — the record-linkage /
  * near-duplicate-title companion to the set-similarity family
  * ([[Dedup]] n-gram Jaccard, MinHash) for the SMALL-EDIT regime:
  * OCR noise, typo variants, templated titles. Where Jaccard on
  * shingles needs substantial shared vocabulary, edit distance
  * certifies character-level closeness — the measure dedup teams
  * reach for on titles/URLs/short keys.
  *
  * Blocking contract (standard ER practice, same stance as
  * [[Advanced]] `er_block`): candidate pairs must share language,
  * the first two key characters, and a length band. Banding is
  * EXACT for the length dimension — each key is emitted at bands
  * floor(len/8) and floor(len/8)+1, so any pair with |len_a −
  * len_b| < 8 (a superset of lev ≤ [[FuzzyMaxLev]], since each
  * edit changes length by at most 1) shares at least one band.
  * The 2-char prefix block is the deliberate recall/cost trade:
  * pairs whose edits touch the first two characters are out of
  * contract (documented, as in all prefix-blocked ER).
  *
  * Scale design: the shuffle carries (lang, prefix2, band) keys
  * plus the 64-byte normalized key — document bodies never move.
  * Candidate generation is bounded by block occupancy, not corpus
  * size squared; Levenshtein runs once per DISTINCT candidate pair
  * on 64-char keys (O(64²) per pair, constant). At 100 TB the
  * block key fans out (lang × 26² prefixes × length bands), so no
  * bucket grows with the corpus beyond true collision density —
  * the same argument as the LSH band join.
  */
object Fuzzy {

  /** Max accepted edit distance — well under the band stride 8. */
  val FuzzyMaxLev = 5
  private val KeyLen = 64
  private val BandW = 8

  /** doc_id, lang, key (lowercased 64-char prefix), emitted at two
    * adjacent length bands.
    */
  private def banded(s: SparkSession, d: String): DataFrame = {
    val k = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        lower(substring(col("text"), 1, KeyLen)).as("key"))
      .withColumn("p2", substring(col("key"), 1, 2))
      .withColumn("band", expr(s"CAST(length(key) AS BIGINT) DIV $BandW"))
    k.union(k.withColumn("band", col("band") + 1))
  }

  /** Pairs of documents whose normalized 64-char keys are within
    * [[FuzzyMaxLev]] edits, found via banded blocking. Columns:
    * id_a < id_b, lev.
    */
  def fuzzyJoinLev(s: SparkSession, d: String): DataFrame = {
    val a = banded(s, d)
    val b = banded(s, d)
      .select(col("doc_id").as("doc_id_b"), col("lang").as("lang_b"),
        col("key").as("key_b"), col("p2").as("p2_b"), col("band").as("band_b"))
    // the banded Levenshtein (threshold form → O(len·maxLev) with
    // early exit, returns −1 past the bound) runs BEFORE the
    // pair-dedup distinct: the ≤2 duplicate evaluations per pair are
    // cheaper than funneling every candidate through the distinct's
    // (AQE-coalesced, near-single-task) post-shuffle stage first
    a.join(b,
        col("lang") === col("lang_b") && col("p2") === col("p2_b") &&
          col("band") === col("band_b") && col("doc_id") < col("doc_id_b"))
      .select(col("doc_id").as("id_a"), col("doc_id_b").as("id_b"),
        levenshtein(col("key"), col("key_b"), FuzzyMaxLev).as("lev"))
      .filter(col("lev") >= 0 && col("lev") <= FuzzyMaxLev)
      .distinct() // the two band emissions can produce the same pair twice
  }

  /** Phonetic blocking key — a Russell/Odell-style soundex code
    * (first letter + first 3 consonant-class digits, adjacent same-
    * class letters collapsed; vowels/H/W/Y map to 0 and BREAK runs —
    * the simplified Odell variant, deliberately omitting full
    * soundex's H/W run-transparency refinement), built as ONE
    * dialect-shared SQL expression: upper/strip → translate to class
    * digits → collapse runs (7 backreference-free regexes — DuckDB's
    * RE2 has no backrefs) → drop the first letter's own run → strip
    * vowel zeros → pad to 3. Identical text runs through Spark's
    * expr() and the DuckDB oracle, so the key itself sits under the
    * hash gate.
    */
  def phoneticKeySql(c: String): String = {
    val letters = "BFPVCGJKQSXZDTLMNRAEIOUYHW"
    val digits = "11112222222233455600000000"
    val u = s"upper(regexp_replace($c, '[^A-Za-z]', ''))"
    val t = s"translate($u, '$letters', '$digits')"
    val collapsed = (0 to 6).foldLeft(t) { (acc, dd) =>
      s"regexp_replace($acc, '$dd$dd+', '$dd')"
    }
    s"concat(substr($u, 1, 1), " +
      s"rpad(substr(replace(substr($collapsed, 2, 64), '0', ''), 1, 3), 3, '0'))"
  }

  /** Entity resolution with a PHONETIC block ([[Advanced]] er_block's
    * sound-alike companion): where er_block's exact last-word block
    * separates spelling variants of the same-sounding word
    * (gear/geer), the soundex-class key co-blocks them; the verify
    * step is the same levenshtein ≤ 2 on the full name. Scale: blocks
    * are keyed by a 4-char code over the DISTINCT-name vocabulary —
    * the er_block law (names dedup first, bodies never move).
    */
  def erPhonetic(s: SparkSession, d: String): DataFrame = {
    val names = Tables.part(s, d)
      .groupBy("p_name")
      .agg(count(lit(1)).as("n_parts"), min("p_partkey").as("canon_key"))
      .withColumn("word", element_at(split(col("p_name"), " "), -1))
      .withColumn("block", expr(phoneticKeySql("word")))
    val a = names.select(col("p_name").as("name_a"), col("canon_key").as("canon_a"),
      col("block"))
    val b = names.select(col("p_name").as("name_b"), col("canon_key").as("canon_b"),
      col("block"))
    a.join(b, "block")
      .filter(col("name_a") < col("name_b") &&
        levenshtein(col("name_a"), col("name_b")) <= 2)
      .select(col("block"), col("name_a"), col("name_b"),
        levenshtein(col("name_a"), col("name_b")).as("dist"),
        col("canon_a"), col("canon_b"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fuzzy_join_lev" -> fuzzyJoinLev,
    "er_phonetic" -> erPhonetic)

  private def erPhoneticOracle: String = {
    val key = phoneticKeySql("word")
    s"""WITH names AS (
       |  SELECT p_name, min(p_partkey) AS canon_key
       |  FROM part GROUP BY p_name),
       |keyed AS (
       |  SELECT p_name, canon_key, $key AS block
       |  FROM (SELECT p_name, canon_key,
       |          string_split(p_name, ' ')[-1] AS word FROM names))
       |SELECT a.block, a.p_name AS name_a, b.p_name AS name_b,
       |  CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist,
       |  a.canon_key AS canon_a, b.canon_key AS canon_b
       |FROM keyed a JOIN keyed b
       |  ON a.block = b.block AND a.p_name < b.p_name
       |WHERE levenshtein(a.p_name, b.p_name) <= 2""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
    "er_phonetic" -> erPhoneticOracle,
    "fuzzy_join_lev" ->
      s"""WITH k AS (
         |  SELECT doc_id, lang, lower(substr(text, 1, $KeyLen)) AS key
         |  FROM documents),
         |b AS (
         |  SELECT doc_id, lang, key, substr(key, 1, 2) AS p2,
         |         len(key) // $BandW AS band FROM k
         |  UNION ALL
         |  SELECT doc_id, lang, key, substr(key, 1, 2) AS p2,
         |         len(key) // $BandW + 1 AS band FROM k),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
         |         a.key AS key, c.key AS key_b
         |  FROM b a JOIN b c
         |    ON a.lang = c.lang AND a.p2 = c.p2 AND a.band = c.band
         |   AND a.doc_id < c.doc_id)
         |SELECT id_a, id_b,
         |       CAST(levenshtein(key, key_b) AS INT) AS lev
         |FROM cand
         |WHERE levenshtein(key, key_b) <= $FuzzyMaxLev""".stripMargin)
}
