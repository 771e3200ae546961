package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** LSH CALIBRATION — the measured S-curve [EXT]: for every
  * co-shingled document pair (the exact n-gram Jaccard producer,
  * df-capped like all graph consumers), did the MinHash 16-band ×
  * 3-row blocking actually collide it? Reported per Jaccard decile:
  * pair count, collided count, measured collision rate (micro).
  * This is the evidence table behind the family's band/row choice —
  * theory says p(s) = 1−(1−s³)¹⁶ (midpoint 0.40, >0.997 at s=0.68);
  * the spec checks the measurement against that curve, the oracle
  * hash-gates the measurement itself (both chains are md5-exact in
  * DuckDB).
  *
  * Scale shape: the denominator is the documented quadratic oracle
  * baseline (same contract as dedup_ngram); the collided flag joins
  * the minhash candidate set on pair ids — at 100 TB one runs this
  * diagnostic on a SAMPLE, which changes nothing in the plan.
  */
object Scurve {

  def lshScurve(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val exact = Dedup.ngramScored(docs)
    val cand = Dedup.minhashScored(docs)
      .select(col("doc_a"), col("doc_b"), lit(1L).as("coll"))
    exact.join(cand, Seq("doc_a", "doc_b"), "left")
      .select(floor(col("jac") * 10).cast("long").as("bucket"),
        coalesce(col("coll"), lit(0L)).as("coll"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_pairs"), sum("coll").as("n_collide"))
      .withColumn("rate_micro", expr("(n_collide * 1000000) DIV n_pairs"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "lsh_scurve" -> lshScurve)

  def oracleSql: Map[String, String] = Map(
    "lsh_scurve" ->
      ("WITH " + Dedup.shSqlOver("documents") + ",\n" +
        Dedup.minhashBucketsSql + ",\n" +
        s"""mcand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
           |          FROM bkt x JOIN bkt y
           |            ON x.band = y.band AND x.bucket = y.bucket
           |           AND x.doc_id < y.doc_id),
           |ex AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
           |ok AS (SELECT shingle FROM ex GROUP BY shingle
           |       HAVING count(*) <= 128),
           |exf AS (SELECT ex.doc_id, ex.shingle FROM ex JOIN ok USING (shingle)),
           |sizes AS (SELECT doc_id, len(shingles) AS nsh FROM sh),
           |prs AS (
           |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS common
           |  FROM exf x JOIN exf y
           |    ON x.shingle = y.shingle AND x.doc_id < y.doc_id
           |  GROUP BY 1, 2),
           |ej AS (
           |  SELECT doc_a, doc_b,
           |    CAST(common AS DOUBLE) / (sa.nsh + sb.nsh - common) AS jac
           |  FROM prs
           |  JOIN sizes sa ON sa.doc_id = doc_a
           |  JOIN sizes sb ON sb.doc_id = doc_b),
           |fl AS (
           |  SELECT CAST(floor(jac * 10) AS BIGINT) AS bucket,
           |    CASE WHEN m.doc_a IS NULL THEN 0 ELSE 1 END AS coll
           |  FROM ej e LEFT JOIN mcand m
           |    ON m.doc_a = e.doc_a AND m.doc_b = e.doc_b)
           |SELECT bucket, count(*) AS n_pairs,
           |  CAST(sum(coll) AS BIGINT) AS n_collide,
           |  CAST(sum(coll) * 1000000 // count(*) AS BIGINT) AS rate_micro
           |FROM fl GROUP BY bucket""".stripMargin))
}
