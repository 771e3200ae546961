package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Similarity search over the `embeddings` table ([EXT]):
  * brute-force cosine top-k as the exact baseline, random-hyperplane
  * LSH bucketing as the scale path, and a pairwise near-dup query.
  *
  * All vector math is `zip_with`/`aggregate` array lambdas over
  * DOUBLE — codegen'd, no UDFs, and bit-identical to the DuckDB
  * oracle's sequential double summation.
  *
  * Scale design: brute-force top-k is O(queries × corpus) — fine for a
  * bounded query set (broadcast the queries, one pass over the corpus,
  * per-partition top-k via window). For corpus×corpus joins use
  * [[annLsh]]: signature bucketing turns the crossJoin into a
  * shuffle-on-bucket join whose cost follows true neighbor density.
  */
object Similarity {

  /** Compiled dot product (graft.functions.DotProduct — true codegen).
    * The declarative twin [[dotLambda]] stays for spec cross-checks.
    */
  private def dot(a: Column, b: Column): Column =
    call_function("vec_dot", a, b)

  def dotLambda(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** vec_id, v (double[]), nrm. */
  private def vecs(s: SparkSession, d: String): DataFrame = {
    graft.functions.DotProduct.register(s)
    val v = col("embedding").cast("array<double>")
    Tables.embeddings(s, d)
      .select(col("vec_id"), v.as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
  }

  /** Exact cosine top-5 neighbors for a fixed query set (vec_id < 8).
    * The query side is tiny at every SF → Spark broadcasts it; the
    * corpus is scanned once, ranked per query.
    */
  def annCosine(s: SparkSession, d: String): DataFrame = {
    val all = vecs(s, d)
    val q = all.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val scored = all.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (dot(col("v"), col("qv")) / (col("nrm") * col("qn"))).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("query_id"), col("neighbor_id"), col("rn"), round(col("cos"), 6).as("cos_sim"))
  }

  // 4 LSH tables × 8 random hyperplanes (deterministic pseudo-random
  // components; fixed at plan build). 8 bits/table → 256 buckets/table.
  private val NumTables = 4
  private val PlanesPerTable = 8
  private val Dim = 64
  private def plane(t: Int, p: Int): Array[Double] =
    Array.tabulate(Dim)(j => math.sin((t * PlanesPerTable + p) * Dim + j + 1.0))
  private def planeLit(t: Int, p: Int): Column =
    array(plane(t, p).map(lit): _*)

  /** Signature of vector v in table t: 8 sign bits packed to an int. */
  private def sigCol(v: Column, t: Int): Column =
    (0 until PlanesPerTable).map { p =>
      when(dot(v, planeLit(t, p)) > 0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Approximate top-5 via multi-table hyperplane LSH: queries and
    * corpus hash into (table, signature) buckets; only same-bucket
    * pairs are scored. Recall is spec-checked against [[annCosine]] in
    * SimilaritySpec; not SQL-oracle-able (plan-time hyperplanes).
    */
  def annLsh(s: SparkSession, d: String): DataFrame = {
    val all = vecs(s, d)
    val buckets = all.select(col("vec_id"), col("v"), col("nrm"),
      posexplode(array((0 until NumTables).map(t => sigCol(col("v"), t)): _*)))
      .toDF("vec_id", "v", "nrm", "table_id", "sig")
    val q = buckets.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"),
        col("table_id"), col("sig"))
    val cand = buckets.as("c")
      .join(broadcast(q).as("qq"),
        col("c.table_id") === col("qq.table_id") && col("c.sig") === col("qq.sig") &&
          col("c.vec_id") =!= col("qq.query_id"))
      .select(col("qq.query_id"), col("c.vec_id").as("neighbor_id"),
        col("c.v").as("v"), col("c.nrm").as("nrm"), col("qq.qv"), col("qq.qn"))
      .distinct()
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    cand
      .withColumn("cos", dot(col("v"), col("qv")) / (col("nrm") * col("qn")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("query_id"), col("neighbor_id"), col("rn"), round(col("cos"), 6).as("cos_sim"))
  }

  // IVF parameters: 16 coarse cells, queries probe the 2 nearest.
  private val NCells = 16
  private val NProbe = 2

  /** Coarse quantizer: deterministic seeds (vec_id < NCells) refined by
    * one distributed Lloyd iteration over a BOUNDED deterministic
    * training set (vec_id < TrainCap — never rand(); retries must see
    * the same rows). Quantizer training needs only a bounded sample:
    * at 100 TB the vec_id predicate prunes the scan and training cost
    * stays O(TrainCap·cells) regardless of corpus size, while at small
    * SF the cap covers the whole corpus (full-quality centroids).
    * Returns (cell_id, cv, cnrm); centroid count is O(cells), so it
    * broadcasts everywhere.
    */
  private val TrainCap = 2048

  private def centroids(all: DataFrame): DataFrame = {
    val sample = all.filter(col("vec_id") < TrainCap)
    val seeds = all.filter(col("vec_id") < NCells)
      .select(col("vec_id").as("cell_id"), col("v").as("cv"), col("nrm").as("cnrm"))
    // argmax via max_by hash aggregation, not a row_number window: the
    // agg shuffles one row per vector; the window would sort the whole
    // (vector × cell) expansion. Ties break to the smallest cell_id.
    val assigned = sample.join(broadcast(seeds))
      .withColumn("cos", dot(col("v"), col("cv")) / (col("nrm") * col("cnrm")))
      .groupBy("vec_id")
      .agg(max_by(struct(col("cell_id"), col("v")),
        struct(col("cos"), -col("cell_id"))).as("best"))
      .select(col("best.cell_id").as("cell_id"), col("best.v").as("v"))
    assigned
      .select(col("cell_id"), posexplode(col("v")))
      .groupBy("cell_id", "pos")
      .agg(avg("col").as("m"))
      .groupBy("cell_id")
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("cell_id"), transform(col("pm"), x => x("m")).as("cv"))
      .withColumn("cnrm", sqrt(dot(col("cv"), col("cv"))))
  }

  /** IVF (inverted-file) ANN — the cluster-then-probe scale path:
    * corpus vectors are bucketed by nearest coarse centroid (the
    * inverted lists); each query scores only the NProbe nearest cells'
    * lists — a (NProbe/NCells) fraction of the corpus instead of all
    * of it. Centroids are broadcast (O(cells)); the corpus is scanned
    * once to assign and once per query batch to score. Recall
    * spec-checked against [[annCosine]]; rows-only for the driver
    * (plan-time refined centroids aren't SQL-expressible).
    */
  def annIvf(s: SparkSession, d: String): DataFrame = {
    val all = vecs(s, d)
    val cents = centroids(all)
    val assigned = all.join(broadcast(cents))
      .withColumn("ccos", dot(col("v"), col("cv")) / (col("nrm") * col("cnrm")))
      .groupBy("vec_id")
      .agg(max_by(struct(col("cell_id"), col("v"), col("nrm")),
        struct(col("ccos"), -col("cell_id"))).as("best"))
      .select(col("vec_id"), col("best.v").as("v"),
        col("best.nrm").as("nrm"), col("best.cell_id").as("cell_id"))
    val probes = assigned.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
      .join(broadcast(cents))
      .withColumn("ccos", dot(col("qv"), col("cv")) / (col("qn") * col("cnrm")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("query_id").orderBy(col("ccos").desc, col("cell_id").asc)))
      .filter(col("rn") <= NProbe)
      .select(col("query_id"), col("qv"), col("qn"), col("cell_id"))
    val wTop = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    assigned.join(broadcast(probes), Seq("cell_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (dot(col("v"), col("qv")) / (col("nrm") * col("qn"))).as("cos"))
      .withColumn("rn", row_number().over(wTop))
      .filter(col("rn") <= 5)
      .select(col("query_id"), col("neighbor_id"), col("rn"), round(col("cos"), 6).as("cos_sim"))
  }

  /** Embedding near-dup pairs: top-50 cosine pairs over a bounded slice
    * (vec_id < 2000 — keeps the exact pairwise form bounded at any SF;
    * the unbounded path is [[annLsh]]'s bucketing).
    */
  def dedupEmbedding(s: SparkSession, d: String): DataFrame = {
    val e = vecs(s, d).filter(col("vec_id") < 2000)
    val a = e.select(col("vec_id").as("vec_a"), col("v").as("va"), col("nrm").as("na"))
    val b = e.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_a").asc, col("vec_b").asc)
      .limit(50)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_cosine" -> annCosine,
    "ann_lsh" -> annLsh,
    "ann_ivf" -> annIvf,
    "dedup_embedding" -> dedupEmbedding)

  def oracleSql: Map[String, String] = Map(
    "ann_cosine" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
        |                                   CAST(embedding AS DOUBLE[]))) AS nrm
        |           FROM embeddings)
        |SELECT query_id, neighbor_id, rn, cos_sim FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    CAST(row_number() OVER (PARTITION BY q.vec_id
        |      ORDER BY list_dot_product(c.v, q.v) / (c.nrm * q.nrm) DESC,
        |               c.vec_id) AS INTEGER) AS rn,
        |    round(list_dot_product(c.v, q.v) / (c.nrm * q.nrm), 6) AS cos_sim
        |  FROM e c JOIN e q ON q.vec_id < 8 AND c.vec_id <> q.vec_id)
        |WHERE rn <= 5""".stripMargin,
    "dedup_embedding" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
        |                                   CAST(embedding AS DOUBLE[]))) AS nrm
        |           FROM embeddings WHERE vec_id < 2000)
        |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cos_sim
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |ORDER BY cos_sim DESC, vec_a, vec_b LIMIT 50""".stripMargin)
}
