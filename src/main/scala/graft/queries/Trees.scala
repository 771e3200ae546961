package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.core.Checkpoints.StableOps

/** CART decision tree ([EXT]) — Breiman et al. '84 trained on cheap
  * surface features of the documents table to predict English text
  * (the fastText-style "is this the language I want" screen a corpus
  * curator runs when lang labels are missing or untrusted).
  *
  * Exactness: features are integer buckets (floor-division rails),
  * and the split criterion is the Gini purity numerator
  * A = pos² + neg² per side — all int64 — combined as ONE fixed-order
  * IEEE chain (A_L/n_L + A_R/n_R)/n micro-quantized, so the argmax
  * split (ties → feature asc, thr asc) reproduces bit-for-bit in the
  * SQL oracle. A per side tops out at n² — int64 holds to ~3e9 docs;
  * shift to DECIMAL(38,0) beyond (the corr_matrix convention).
  *
  * Scale shape: ONE tokenize pass produces the per-doc feature row;
  * each tree level is a groupBy on (feature, bucket[, side]) cells —
  * bounded by the bucket grid (≤ ~64 values/feature), NOT the corpus —
  * and the split argmax windows run on those cells. Depth is a
  * declared constant, so training is 3 cell-aggregations end to end;
  * no iteration, no driver loop. Prediction is a broadcast join of
  * the 3-row split table against the feature pass.
  */
object Trees {

  /** Split-score micro scale. */
  private val Mega = 1000000L

  /** Per-doc integer feature + label frame: doc_id, is_en, and the
    * four bucketed features (tall: one row per (doc, feature)).
    * Buckets: stopword per-mille ÷25, punctuation per-mille ÷25,
    * avg word length in half-chars (deci-chars ÷5), length ÷200
    * capped at 30. */
  private[graft] def featsWide(s: SparkSession, d: String): DataFrame = {
    val stopArr = array(TextOps.StopwordsPub.map(lit): _*)
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("text"),
        Dedup.tokensCol(col("text")).as("ws"))
      .select(col("doc_id"),
        when(col("lang") === "en", 1L).otherwise(0L).as("is_en"),
        greatest(size(col("ws")).cast("long"), lit(1L)).as("ntok"),
        aggregate(transform(col("ws"), w => length(w)), lit(0L),
          (a, x) => a + x).as("sumlen"),
        size(filter(col("ws"), w => array_contains(stopArr, w)))
          .cast("long").as("nstop"),
        length(regexp_replace(col("text"), "[\\p{L}\\p{N}\\s]", ""))
          .cast("long").as("punct"),
        greatest(length(col("text")).cast("long"), lit(1L)).as("nchars"))
      .select(col("doc_id"), col("is_en"),
        expr("nstop * 1000 div ntok div 25").as("f_stop"),
        expr("punct * 1000 div nchars div 25").as("f_punct"),
        expr("sumlen * 10 div ntok div 5").as("f_wlen"),
        least(expr("nchars div 200"), lit(30L)).as("f_len"))
  }

  private val Features = Seq("f_stop", "f_punct", "f_wlen", "f_len")

  private def tall(wide: DataFrame): DataFrame =
    Features.map(f => wide.select(col("doc_id"), col("is_en"),
      lit(f).as("feature"), col(f).as("v"))).reduce(_ unionAll _)

  /** Best (feature, thr) per group: cells → cumulative (n_L, pos_L)
    * over bucket order, Gini score, rank-1 row. `grp` columns prefix
    * the partition (empty for the root). */
  private def bestSplit(cells: DataFrame, grp: Seq[String]): DataFrame = {
    val gcols = grp.map(col)
    val fW = Window.partitionBy((gcols :+ col("feature")): _*).orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tW = Window.partitionBy((gcols :+ col("feature")): _*)
    val scored = cells
      .withColumn("n_l", sum("n").over(fW))
      .withColumn("pos_l", sum("npos").over(fW))
      .withColumn("n_t", sum("n").over(tW))
      .withColumn("pos_t", sum("npos").over(tW))
      .filter(col("n_l") < col("n_t"))
      .withColumn("n_r", col("n_t") - col("n_l"))
      .withColumn("pos_r", col("pos_t") - col("pos_l"))
      .withColumn("a_l", col("pos_l") * col("pos_l")
        + (col("n_l") - col("pos_l")) * (col("n_l") - col("pos_l")))
      .withColumn("a_r", col("pos_r") * col("pos_r")
        + (col("n_r") - col("pos_r")) * (col("n_r") - col("pos_r")))
      .withColumn("score_micro",
        floor((col("a_l").cast("double") / col("n_l")
          + col("a_r").cast("double") / col("n_r"))
          / col("n_t") * Mega + lit(0.5)).cast("long"))
    val rkW = Window.partitionBy(gcols: _*)
      .orderBy(col("score_micro").desc, col("feature").asc, col("v").asc)
    scored.withColumn("rk", row_number().over(rkW)).filter(col("rk") === 1)
      .select((gcols :+ col("feature").as("split_feature")
        :+ col("v").as("thr") :+ col("score_micro")
        :+ col("n_t").as("n") :+ col("pos_t").as("n_pos")): _*)
  }

  /** side assignment predicate against a broadcast (split_feature,
    * thr) row: L iff the named feature value is <= thr. */
  private def sideExpr: Column =
    when(Features.map(f =>
      col("split_feature") === f && col(f) <= col("thr")).reduce(_ || _), "L")
      .otherwise(lit("R"))

  /** The TRAINING chain: root and child split frames (both `.stable`,
    * 1 and 2 rows). Shared by the trainer (which refreshes the session
    * cache) and the cold-cache serve path.
    */
  private def trainSplits(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val wide = featsWide(s, d).stable
    val t = tall(wide)
    val rootCells = t.groupBy("feature", "v")
      .agg(count(lit(1)).as("n"), sum("is_en").as("npos"))
    val root = bestSplit(rootCells, Seq.empty).stable
    // side assignment: broadcast the 1-row root against the wide pass
    val assigned = wide.crossJoin(broadcast(
        root.select(col("split_feature"), col("thr"))))
      .withColumn("side", sideExpr).stable
    val childCells = tall(assigned.drop("split_feature", "thr"))
      .join(assigned.select("doc_id", "side"), "doc_id")
      .groupBy("side", "feature", "v")
      .agg(count(lit(1)).as("n"), sum("is_en").as("npos"))
    val children = bestSplit(childCells, Seq("side")).stable
    wide.unpersist(false); assigned.unpersist(false)
    (root, children)
  }

  /** Train-once/serve-many ([[graft.core.ModelCache]], the Mf
    * convention): `tree_predict` reuses the session's trained 3-row
    * split model; `tree_train` always retrains and refreshes. The
    * cached frames are 1+2 rows — nothing corpus-sized is retained.
    */
  private val SplitConstants = "depth=2,gini-int64"

  private def splitsCached(s: SparkSession, d: String): (DataFrame, DataFrame) =
    graft.core.ModelStore.cachedDurable(s, d, "tree_splits",
      SplitConstants, 2)(trainSplits(s, d)) {
      case (r, c) => Seq(r, c)
    } { case Seq(r, c) => (r, c) }

  /** Trained depth-2 tree: one row per node — root, L/R internal
    * children (each with its chosen split), and the four leaves with
    * majority-vote predictions (tie → 0). */
  def treeTrain(s: SparkSession, d: String): DataFrame = {
    val (root, children) =
      graft.core.ModelStore.putDurable(s, d, "tree_splits",
        SplitConstants, trainSplits(s, d)) { case (r, c) => Seq(r, c) }
    // leaf census: one fresh feature pass routed through the splits
    val wide = featsWide(s, d).stable
    val assigned = wide.crossJoin(broadcast(
        root.select(col("split_feature"), col("thr"))))
      .withColumn("side", sideExpr)
    val leaves = assigned
      .join(broadcast(children.select(col("side"),
        col("split_feature").as("cf"), col("thr").as("ct"))), "side")
      .withColumn("sub", concat(col("side"),
        when(Features.map(f => col("cf") === f && col(f) <= col("ct"))
          .reduce(_ || _), "L").otherwise("R")))
      .groupBy(col("sub").as("node_id"))
      .agg(count(lit(1)).as("n"), sum("is_en").as("n_pos"))
      .select(col("node_id"), lit(null).cast("string").as("split_feature"),
        lit(null).cast("long").as("thr"),
        lit(null).cast("long").as("score_micro"), col("n"), col("n_pos"),
        (col("n_pos") * 2 > col("n")).as("pred"))
    val internal = root.select(lit("root").as("node_id"), col("split_feature"),
        col("thr"), col("score_micro"), col("n"), col("n_pos"),
        lit(null).cast("boolean").as("pred"))
      .unionAll(children.select(col("side").as("node_id"),
        col("split_feature"), col("thr"), col("score_micro"), col("n"),
        col("n_pos"), lit(null).cast("boolean").as("pred")))
    val out = internal.unionAll(leaves).stable
    wide.unpersist(false)
    out
  }

  /** Per-document prediction: leaf id, predicted is_en, actual is_en —
    * a broadcast of the (session-cached) 3-row split table over the
    * single feature pass (no second corpus shuffle; the model is not
    * retrained when the session already trained it). */
  def treePredict(s: SparkSession, d: String): DataFrame = {
    val (root, children) = splitsCached(s, d)
    val wide = featsWide(s, d).stable
    val assigned = wide.crossJoin(broadcast(
        root.select(col("split_feature"), col("thr"))))
      .withColumn("side", sideExpr).stable
    val leafPred = assigned
      .join(broadcast(children.select(col("side"),
        col("split_feature").as("cf"), col("thr").as("ct"))), "side")
      .withColumn("leaf", concat(col("side"),
        when(Features.map(f => col("cf") === f && col(f) <= col("ct"))
          .reduce(_ || _), "L").otherwise("R")))
    val majorities = leafPred.groupBy("leaf")
      .agg((sum("is_en") * 2 > count(lit(1))).as("pred_en"))
    val out = leafPred
      .join(broadcast(majorities), "leaf")
      .select(col("doc_id"), col("leaf"), col("pred_en"),
        (col("is_en") === 1L).as("actual_en")).stable
    wide.unpersist(false); assigned.unpersist(false)
    out
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tree_train" -> treeTrain,
    "tree_predict" -> treePredict)

  /** Shared oracle prefix: the per-doc feature pass and the generic
    * split scorer, as SQL text. */
  private val featsSql = {
    val stopList = TextOps.StopwordsPub.map(w => s"'$w'").mkString(",")
    s"""feats AS MATERIALIZED (
       |  SELECT doc_id,
       |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_en,
       |    nstop * 1000 // ntok // 25 AS f_stop,
       |    punct * 1000 // nchars // 25 AS f_punct,
       |    sumlen * 10 // ntok // 5 AS f_wlen,
       |    least(nchars // 200, 30) AS f_len
       |  FROM (
       |    SELECT doc_id, lang,
       |      greatest(len(ws), 1) AS ntok,
       |      CAST(coalesce(list_sum(list_transform(ws, x -> len(x))), 0)
       |        AS BIGINT) AS sumlen,
       |      len(list_filter(ws, x -> list_contains([$stopList], x))) AS nstop,
       |      CAST(length(regexp_replace(text, '[\\p{L}\\p{N}\\s]', '', 'g'))
       |        AS BIGINT) AS punct,
       |      greatest(length(text), 1) AS nchars
       |    FROM (SELECT doc_id, lang, text,
       |            list_filter(string_split_regex(text, '[^\\p{L}]+'),
       |                        x -> len(x) > 0) AS ws
       |          FROM documents))),
       |tall AS MATERIALIZED (
       |  SELECT doc_id, is_en, 'f_stop' AS feature, f_stop AS v FROM feats
       |  UNION ALL SELECT doc_id, is_en, 'f_punct', f_punct FROM feats
       |  UNION ALL SELECT doc_id, is_en, 'f_wlen', f_wlen FROM feats
       |  UNION ALL SELECT doc_id, is_en, 'f_len', f_len FROM feats)""".stripMargin
  }

  /** Split scorer over a cell CTE with optional partition prefix. */
  private def splitSql(cellCte: String, grpCols: Seq[String]): String = {
    val pfx = if (grpCols.isEmpty) "" else grpCols.mkString("", ", ", ", ")
    val byGrp = if (grpCols.isEmpty) "" else
      grpCols.mkString("PARTITION BY ", ", ", " ")
    val byGrpF = if (grpCols.isEmpty) "PARTITION BY feature"
      else grpCols.mkString("PARTITION BY ", ", ", ", feature")
    s"""SELECT $pfx feature AS split_feature, v AS thr, score_micro,
       |  n_t AS n, pos_t AS n_pos
       |FROM (
       |  SELECT *, row_number() OVER (${byGrp}ORDER BY score_micro DESC,
       |    feature ASC, v ASC) AS rk
       |  FROM (
       |    SELECT $pfx feature, v, n_t, pos_t,
       |      CAST(floor((CAST(a_l AS DOUBLE) / n_l
       |          + CAST(a_r AS DOUBLE) / n_r) / n_t * 1000000 + 0.5)
       |        AS BIGINT) AS score_micro
       |    FROM (
       |      SELECT *,
       |        pos_l * pos_l + (n_l - pos_l) * (n_l - pos_l) AS a_l,
       |        pos_r * pos_r + (n_r - pos_r) * (n_r - pos_r) AS a_r
       |      FROM (
       |        SELECT *, n_t - n_l AS n_r, pos_t - pos_l AS pos_r
       |        FROM (
       |          SELECT $pfx feature, v,
       |            CAST(sum(n) OVER ($byGrpF ORDER BY v
       |              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_l,
       |            CAST(sum(npos) OVER ($byGrpF ORDER BY v
       |              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pos_l,
       |            CAST(sum(n) OVER ($byGrpF) AS BIGINT) AS n_t,
       |            CAST(sum(npos) OVER ($byGrpF) AS BIGINT) AS pos_t
       |          FROM $cellCte)
       |        WHERE n_l < n_t))))
       |WHERE rk = 1""".stripMargin
  }

  /** Tree CTE chain shared by both oracles: root/children splits and
    * per-doc leaf assignment. */
  private val treeSql =
    s"""$featsSql,
       |root_cells AS (
       |  SELECT feature, v, count(*) AS n, sum(is_en) AS npos
       |  FROM tall GROUP BY 1, 2),
       |root AS MATERIALIZED (
       |${splitSql("root_cells", Seq.empty)}),
       |assigned AS MATERIALIZED (
       |  SELECT f.*, CASE WHEN
       |      (r.split_feature = 'f_stop' AND f.f_stop <= r.thr)
       |      OR (r.split_feature = 'f_punct' AND f.f_punct <= r.thr)
       |      OR (r.split_feature = 'f_wlen' AND f.f_wlen <= r.thr)
       |      OR (r.split_feature = 'f_len' AND f.f_len <= r.thr)
       |    THEN 'L' ELSE 'R' END AS side
       |  FROM feats f CROSS JOIN root r),
       |child_cells AS (
       |  SELECT a.side, t.feature, t.v, count(*) AS n, sum(t.is_en) AS npos
       |  FROM tall t JOIN assigned a USING (doc_id)
       |  GROUP BY 1, 2, 3),
       |children AS MATERIALIZED (
       |${splitSql("child_cells", Seq("side"))}),
       |leafed AS MATERIALIZED (
       |  SELECT a.doc_id, a.is_en, a.side || CASE WHEN
       |      (c.split_feature = 'f_stop' AND a.f_stop <= c.thr)
       |      OR (c.split_feature = 'f_punct' AND a.f_punct <= c.thr)
       |      OR (c.split_feature = 'f_wlen' AND a.f_wlen <= c.thr)
       |      OR (c.split_feature = 'f_len' AND a.f_len <= c.thr)
       |    THEN 'L' ELSE 'R' END AS leaf
       |  FROM assigned a JOIN children c ON c.side = a.side)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "tree_train" ->
      s"""WITH $treeSql
         |SELECT 'root' AS node_id, split_feature, thr, score_micro, n, n_pos,
         |  CAST(NULL AS BOOLEAN) AS pred FROM root
         |UNION ALL
         |SELECT side, split_feature, thr, score_micro, n, n_pos, NULL
         |FROM children
         |UNION ALL
         |SELECT leaf, NULL, NULL, NULL, count(*),
         |  CAST(sum(is_en) AS BIGINT), sum(is_en) * 2 > count(*)
         |FROM leafed GROUP BY leaf""".stripMargin,
    "tree_predict" ->
      s"""WITH $treeSql,
         |maj AS (SELECT leaf, sum(is_en) * 2 > count(*) AS pred_en
         |        FROM leafed GROUP BY leaf)
         |SELECT l.doc_id, l.leaf, m.pred_en, l.is_en = 1 AS actual_en
         |FROM leafed l JOIN maj m USING (leaf)""".stripMargin)
}
