package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.core.Checkpoints.StableOps

/** Iterative graph analytics beyond PageRank/BFS ([EXT]): HITS
  * hubs/authorities on the bipartite interaction graph and weighted
  * single-source shortest paths on the co-purchase graph.
  *
  * Both iterations are INTEGER-quantized so every round reproduces
  * bit-for-bit in any engine: HITS normalizes by the round maximum
  * with int64 floor division (no float eigen-normalization), and
  * SSSP relaxes int64 micro-unit weights under min-plus — exact by
  * construction. This is the repo's standard trick for putting
  * float-native algorithms under the DuckDB hash gate
  * (cf. pagerank's term-mirrored doubles, classifier_train's
  * integer-cent GD).
  */
object Graphs {

  /** HITS rounds — fixed, like pagerank's 10 (Kleinberg '99 converges
    * geometrically; both engines compute the same truncation; the
    * leaderboard is stable well before round 6 on this graph). */
  val HitsRounds = 6
  /** Per-side leaderboard size. */
  val HitsK = 20
  /** SSSP relaxation rounds (graph diameter bound at bench SF;
    * un-relaxed nodes simply keep their best-so-far distance — the
    * oracle runs the identical truncation). */
  val SsspRounds = 6

  /** User→part interaction edges (the implicit-feedback bipartite
    * graph, same producer as [[Recommend]]). */
  private def interactions(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("user_id"), col("l_partkey").as("part_id"))
      .distinct()

  /** HITS (Kleinberg '99) on the user→part bipartite graph: users are
    * hubs (curators whose baskets point at good items), parts are
    * authorities. Each round is the classic mutual reinforcement
    * a = Σ h(in-neighbors), h = Σ a(out-neighbors), but normalized by
    * the round MAXIMUM via int64 floor division instead of the L2
    * norm — same fixed point direction, exact integer arithmetic.
    * Scores live in [0, 1e6] micro-units; top-[[HitsK]] per side.
    *
    * Scale shape: the edge list is materialized TWICE, pre-hashed on
    * each join key (user_id and part_id) — score tables come out of
    * groupBys already partitioned on the same keys (checkpoint
    * preserves outputPartitioning), so every per-round |E| join is
    * exchange-FREE; the only per-round shuffles are the partial-agg'd
    * |V|-row score exchanges and a 1-row max broadcast (the 2×
    * storage-for-shuffle trade every production HITS/PageRank at
    * scale makes). No driver action inside the loop. At ~1e9-user
    * scale the `raw*1e6` product approaches the int64 rail — shift
    * the normalization product to DECIMAL(38,0) there (the
    * corr_matrix convention).
    */
  def graphHits(s: SparkSession, d: String): DataFrame = {
    val eU = interactions(s, d).repartition(col("user_id")).stable
    val eP = eU.repartition(col("part_id")).stable
    var hubs = eU.select(col("user_id")).distinct()
      .select(col("user_id"), lit(1000000L).as("h"))
    var auths: DataFrame = null
    var prevA: DataFrame = null
    for (i <- 1 to HitsRounds) {
      // araw/hraw are persisted because each feeds BOTH its max-
      // broadcast job and the normalized frame's consumers — without
      // the cache every broadcast exchange re-runs the |E| join chain.
      // h is CHECKPOINTED every round: each round's plan references
      // its predecessor 4× (two raw-score joins, two max subqueries),
      // so anything short of per-round lineage truncation grows the
      // plan tree 4^i-fold (the first cut, a stride-4 checkpoint,
      // OOM'd the driver just STRINGIFYING the plan). The per-round
      // frames are |V|-row score tables — the eager action is cheap.
      val araw = eU.join(hubs, "user_id")
        .groupBy("part_id").agg(sum("h").as("araw")).persist()
      val amax = araw.agg(max("araw").as("amax"))
      val a = araw.crossJoin(broadcast(amax))
        .select(col("part_id"), expr("araw * 1000000L div amax").as("a"))
        .persist()
      val hraw = eP.join(a, "part_id")
        .groupBy("user_id").agg(sum("a").as("hraw")).persist()
      val hmax = hraw.agg(max("hraw").as("hmax"))
      val h = hraw.crossJoin(broadcast(hmax))
        .select(col("user_id"), expr("hraw * 1000000L div hmax").as("h"))
        .stableLoop
      // h is materialized: retire the round's scratch and the
      // superseded frames (the final round's `a` survives as auths)
      araw.unpersist(false); hraw.unpersist(false)
      hubs.unpersist(false)
      if (prevA != null) prevA.unpersist(false)
      prevA = a
      hubs = h
      auths = a
    }
    // orderBy+limit compiles to TakeOrderedAndProject (per-partition
    // top-k + driver merge of K×P rows) — the global row_number window
    // runs only on the K-row leaderboard, never on |V| rows
    val rkW = Window.orderBy(col("score").desc, col("node_id").asc)
    val topA = auths
      .select(lit("authority").as("node_type"), col("part_id").as("node_id"),
        col("a").as("score"))
      .orderBy(col("score").desc, col("node_id").asc).limit(HitsK)
      .withColumn("rk", row_number().over(rkW).cast("long"))
    val topH = hubs
      .select(lit("hub").as("node_type"), col("user_id").as("node_id"),
        col("h").as("score"))
      .orderBy(col("score").desc, col("node_id").asc).limit(HitsK)
      .withColumn("rk", row_number().over(rkW).cast("long"))
    val out = topA.unionAll(topH).stable
    auths.unpersist(false)
    eU.unpersist(false); eP.unpersist(false)
    out
  }

  /** Co-purchase edges (parts bought together in ≥2 orders — the
    * adamic-adar producer) with int64 micro-unit weights
    * w = 1e6/support: stronger ties are shorter. Symmetrized. */
  private[graft] def weightedEdges(s: SparkSession, d: String): DataFrame = {
    val items = Tables.lineitem(s, d)
      .select("l_orderkey", "l_partkey").distinct()
    val ia = items.select(col("l_orderkey"), col("l_partkey").as("pa"))
    val ib = items.select(col("l_orderkey").as("ok2"), col("l_partkey").as("pb"))
    val und = ia.join(ib, col("l_orderkey") === col("ok2") && col("pa") < col("pb"))
      .groupBy("pa", "pb").agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= 2)
      .select(col("pa"), col("pb"), expr("1000000L div n_ab").as("w"))
    und.select(col("pa").as("src"), col("pb").as("dst"), col("w"))
      .unionAll(und.select(col("pb").as("src"), col("pa").as("dst"), col("w")))
  }

  /** Weighted single-source shortest paths by bounded Bellman-Ford
    * over the co-purchase graph: source = the max-degree node
    * (deterministic ties → smallest id; a 1-row broadcast, no
    * hard-coded key — the min-id choice landed in 2-node components
    * at some SFs), [[SsspRounds]] min-plus relaxations over exact
    * int64 micro-unit distances. Emits every node reached within the
    * round budget.
    *
    * Scale shape: the distance table holds only REACHED nodes, so
    * early rounds join a small frontier-superset against the
    * src-keyed edge list; each round is one |E ⋉ reached| join + a
    * min groupBy (partial-agg'd). No driver action in the loop;
    * stride-3 checkpoints bound plan depth. Min-plus over integers
    * is associative and exact — the oracle runs the identical
    * truncated relaxation.
    */
  def graphSssp(s: SparkSession, d: String): DataFrame = {
    val e = weightedEdges(s, d).repartition(col("src")).stable
    var dist = e.groupBy("src").agg(count(lit(1)).as("deg"))
      .orderBy(col("deg").desc, col("src").asc).limit(1)
      .select(col("src").as("node"), lit(0L).as("dist_micro"))
    val retired = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    for (i <- 1 to SsspRounds) {
      val relaxed = e.join(dist.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          (col("dist_micro") + col("w")).as("dist_micro"))
      var next = dist.unionAll(relaxed)
        .groupBy("node").agg(min("dist_micro").as("dist_micro"))
      val isCkpt = i % 3 == 0
      next = if (isCkpt) next.stableLoop else next.persist()
      retired += dist
      if (isCkpt) { retired.foreach(_.unpersist(false)); retired.clear() }
      dist = next
    }
    val out = dist.select(col("node").as("part_id"), col("dist_micro")).stable
    retired.foreach(_.unpersist(false))
    e.unpersist(false)
    out
  }

  /** PPR power-iteration rounds (fixed — the pagerank convention). */
  val PprRounds = 8
  /** Restart probability (1 − damping). */
  val PprTele = 0.15
  val PprDamp = 0.85
  /** Rank unit: 1.0 of walk mass in int64 nano units. */
  val PprNano = 1000000000L
  /** Teleport share per round in nano (0.15 · [[PprNano]]). */
  val PprTeleNano = 150000000L

  /** PERSONALIZED PageRank (random walk with restart, Haveliwala '02 /
    * Tong et al. '06) from the co-purchase graph's max-degree node:
    * every restart teleports to the SEED (not uniformly) so the
    * stationary mass is a similarity-to-seed score — the graph
    * diffusion form of "items related to X", and the repo's PageRank
    * family generalized from global centrality to query-conditioned
    * relevance. Seed choice mirrors [[graphSssp]] (max degree, ties →
    * smallest id; a 1-row frame, no hard-coded key).
    *
    * Exactness (the graph_hits integer convention): rank lives in
    * int64 NANO units — each round is tele_nano + (Σ rank_nano div
    * outdeg)·85 div 100, so every sum is an integer sum
    * (merge-order independent; no knife-edge 6th-decimal flips from
    * Spark's nondeterministic partial-agg merge order, unlike the
    * raw-double pagerank precedent). The symmetric graph has no
    * dangling nodes, so no dangling-mass term. Under the DuckDB gate
    * with the rounds unrolled as CTEs doing identical arithmetic.
    *
    * Scale shape: the rank frame is SPARSE — only nodes the walk has
    * reached carry rows, so round i costs |E ⋉ reached_i| (frontier-
    * bounded, like [[graphSssp]]), not |V|; the seed teleport is a
    * 1-row outer join. Edges pre-hashed on src; stride-3 checkpoints
    * bound plan depth; no driver action in the loop.
    */
  def graphPpr(s: SparkSession, d: String): DataFrame = {
    val e = weightedEdges(s, d).select("src", "dst")
      .repartition(col("src")).stable
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val ann = e.join(deg, "src").repartition(col("src")).stable
    val seed = deg.orderBy(col("outdeg").desc, col("src").asc).limit(1)
      .select(col("src").as("node")).stable
    val r = pprRoundsOn(ann, seed)
    val out = r.filter(col("rank_nano") > 0)
      .select(col("node").as("part_id"), col("rank_nano"))
    ann.unpersist(false); e.unpersist(false)
    out
  }

  /** The PPR round loop over a pre-annotated (src, dst, outdeg) edge
    * frame — shared by [[graphPpr]] and tools/GraphScaleCurve (whose
    * `census` hook counts each round's frontier join), so the
    * scale-curve evidence measures THIS arithmetic, never a copy that
    * can drift.
    */
  private[graft] def pprRoundsOn(ann: DataFrame, seed: DataFrame,
      census: DataFrame => Unit = _ => ()): DataFrame = {
    var r: DataFrame = seed.select(col("node"), lit(PprNano).as("rank_nano"))
    val retired = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    for (i <- 1 to PprRounds) {
      val joined = ann.join(r.withColumnRenamed("node", "src"), "src")
      census(joined)
      val contrib = joined
        .groupBy("dst")
        .agg(sum(expr("rank_nano div outdeg")).as("in_nano"))
        .withColumnRenamed("dst", "node")
      var next = contrib
        .join(seed.withColumn("tele_nano", lit(PprTeleNano)),
          Seq("node"), "full_outer")
        .select(col("node"),
          (coalesce(col("tele_nano"), lit(0L)) +
            expr("coalesce(in_nano, 0L) * 85 div 100")).as("rank_nano"))
      val isCkpt = i % 3 == 0 || i == PprRounds
      next = if (isCkpt) next.stableLoop else next.persist()
      retired += r
      if (isCkpt) { retired.foreach(_.unpersist(false)); retired.clear() }
      r = next
    }
    retired.foreach(_.unpersist(false))
    r
  }

  /** Closeness BFS round budget (hop horizon) and seed count. */
  val ClosenessRounds = 6
  val ClosenessSeeds = 4

  /** Closeness centrality (Wasserman-Faust normalized for
    * disconnected graphs) of the [[ClosenessSeeds]] top-degree nodes:
    * multi-source BFS to the [[ClosenessRounds]]-hop horizon, then
    * CC(u) = ((r−1)/(n−1)) · ((r−1)/Σdist) with r = reached nodes —
    * the "how central are my hubs really" read that degree alone
    * cannot give (a high-degree node on the periphery reaches the
    * rest of the graph slowly; closeness sees that, degree doesn't).
    *
    * Exactness: hop distances are integers, the reached/Σdist cells
    * are integer sums, and CC is ONE micro-quantized double division
    * of exact integers — merge-order free; the oracle unrolls the
    * same min-relaxation rounds as CTEs.
    *
    * Scale shape: the distance frame holds only (seed, reached-node)
    * rows — |seeds| × frontier, never |V|² — and each round is one
    * |E ⋉ reached| join + a min groupBy, the graphSssp contract with
    * a seed dimension threaded through. Seeds are a |seeds|-row
    * broadcast; no driver action in the loop.
    */
  def graphCloseness(s: SparkSession, d: String): DataFrame = {
    val e = weightedEdges(s, d).select("src", "dst")
      .repartition(col("src")).stable
    val nv = e.select(col("src").as("n"))
      .union(e.select(col("dst").as("n"))).distinct()
      .agg(count(lit(1)).as("n_nodes"))
    val seeds = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
      .orderBy(col("outdeg").desc, col("src").asc).limit(ClosenessSeeds)
      .select(col("src").as("seed")).stable
    var dist = seeds.select(col("seed"), col("seed").as("node"),
      lit(0L).as("dist"))
    val retired = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    for (i <- 1 to ClosenessRounds) {
      val relaxed = e.join(dist.withColumnRenamed("node", "src"), "src")
        .select(col("seed"), col("dst").as("node"),
          (col("dist") + lit(1L)).as("dist"))
      var next = dist.unionAll(relaxed)
        .groupBy("seed", "node").agg(min("dist").as("dist"))
      val isCkpt = i % 3 == 0 || i == ClosenessRounds
      next = if (isCkpt) next.stableLoop else next.persist()
      retired += dist
      if (isCkpt) { retired.foreach(_.unpersist(false)); retired.clear() }
      dist = next
    }
    val out = dist.groupBy("seed")
      .agg(count(lit(1)).as("n_reached"), sum("dist").as("sum_dist"))
      .crossJoin(broadcast(nv))
      .select(col("seed"), col("n_reached"), col("sum_dist"),
        when(col("sum_dist") > 0,
          floor(((col("n_reached") - 1) * (col("n_reached") - 1))
            .cast("double") * 1e6
            / ((col("n_nodes") - 1) * col("sum_dist")) + lit(0.5))
            .cast("long"))
          .otherwise(lit(0L)).as("closeness_micro"))
      .stable
    retired.foreach(_.unpersist(false))
    e.unpersist(false)
    out
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_hits" -> graphHits,
    "graph_ppr" -> graphPpr,
    "graph_closeness" -> graphCloseness,
    "graph_sssp" -> graphSssp)

  private val interactionsSql =
    """e AS (
      |  SELECT DISTINCT o.o_custkey AS user_id, l.l_partkey AS part_id
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "graph_hits" -> {
      // 8 mutual-reinforcement rounds unrolled; DuckDB's // floors
      // positives exactly like Spark's div. sums are HUGEINT — CAST
      // back to BIGINT at each normalization. Every round CTE is
      // MATERIALIZED: DuckDB inlines CTEs by default, and each round
      // references its predecessor twice (sum join + max subquery),
      // so an inlined chain expands exponentially.
      val rounds = (1 to HitsRounds).map { i =>
        val prevH = if (i == 1) "h0" else s"h${i - 1}"
        s"""a${i}r AS MATERIALIZED (
           |  SELECT e.part_id, CAST(sum(p.h) AS BIGINT) AS araw
           |  FROM e JOIN $prevH p USING (user_id) GROUP BY e.part_id),
           |a$i AS MATERIALIZED (
           |  SELECT part_id,
           |    CAST(araw * 1000000 // (SELECT max(araw) FROM a${i}r) AS BIGINT) AS a
           |  FROM a${i}r),
           |h${i}r AS MATERIALIZED (
           |  SELECT e.user_id, CAST(sum(a.a) AS BIGINT) AS hraw
           |  FROM e JOIN a$i a USING (part_id) GROUP BY e.user_id),
           |h$i AS MATERIALIZED (
           |  SELECT user_id,
           |    CAST(hraw * 1000000 // (SELECT max(hraw) FROM h${i}r) AS BIGINT) AS h
           |  FROM h${i}r)""".stripMargin
      }.mkString(",\n")
      s"""WITH ${interactionsSql.replace("e AS (", "e AS MATERIALIZED (")},
         |h0 AS MATERIALIZED (SELECT DISTINCT user_id, CAST(1000000 AS BIGINT) AS h FROM e),
         |$rounds
         |SELECT * FROM (
         |  SELECT 'authority' AS node_type, part_id AS node_id, a AS score,
         |    CAST(row_number() OVER (ORDER BY a DESC, part_id) AS BIGINT) AS rk
         |  FROM a$HitsRounds) WHERE rk <= $HitsK
         |UNION ALL
         |SELECT * FROM (
         |  SELECT 'hub' AS node_type, user_id AS node_id, h AS score,
         |    CAST(row_number() OVER (ORDER BY h DESC, user_id) AS BIGINT) AS rk
         |  FROM h$HitsRounds) WHERE rk <= $HitsK""".stripMargin
    },
    "graph_ppr" -> {
      // sparse rounds mirrored: contributions from reached nodes only,
      // seed teleport via 1-row full outer join; same int64 nano chain
      // as the Spark side (tele_nano + (Σ rank_nano // outdeg)·85//100
      // — integer sums are merge-order independent; DuckDB's // equals
      // Spark's div on the non-negative values here)
      val rounds = (1 to PprRounds).map { i =>
        s"""r$i AS (
           |  SELECT coalesce(c.node, sd.node) AS node,
           |    CAST(coalesce(sd.tele_nano, 0)
           |      + coalesce(c.inr, 0) * 85 // 100 AS BIGINT) AS rank_nano
           |  FROM (
           |    SELECT s.dst AS node,
           |      CAST(sum(r.rank_nano // d.outdeg) AS BIGINT) AS inr
           |    FROM sym s JOIN r${i - 1} r ON r.node = s.src
           |    JOIN deg d ON d.src = s.src
           |    GROUP BY s.dst) c
           |  FULL OUTER JOIN (SELECT node, CAST($PprTeleNano AS BIGINT)
           |    AS tele_nano FROM seed) sd
           |    ON sd.node = c.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH items AS (
         |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |und AS (
         |  SELECT a.l_partkey AS pa, b.l_partkey AS pb
         |  FROM items a JOIN items b
         |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         |  GROUP BY 1, 2 HAVING count(*) >= 2),
         |sym AS MATERIALIZED (
         |  SELECT pa AS src, pb AS dst FROM und
         |  UNION ALL SELECT pb, pa FROM und),
         |deg AS MATERIALIZED (
         |  SELECT src, count(*) AS outdeg FROM sym GROUP BY src),
         |seed AS (SELECT src AS node FROM deg
         |         ORDER BY outdeg DESC, src ASC LIMIT 1),
         |r0 AS (SELECT node, CAST($PprNano AS BIGINT) AS rank_nano FROM seed),
         |$rounds
         |SELECT node AS part_id, rank_nano
         |FROM r$PprRounds WHERE rank_nano > 0""".stripMargin
    },
    "graph_closeness" -> {
      val rounds = (1 to ClosenessRounds).map { i =>
        s"""d$i AS MATERIALIZED (
           |  SELECT seed, node, min(dist) AS dist FROM (
           |    SELECT seed, node, dist FROM d${i - 1}
           |    UNION ALL
           |    SELECT p.seed, s.dst AS node, p.dist + 1 AS dist
           |    FROM sym s JOIN d${i - 1} p ON p.node = s.src)
           |  GROUP BY seed, node)""".stripMargin
      }.mkString(",\n")
      s"""WITH items AS (
         |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |und AS (
         |  SELECT a.l_partkey AS pa, b.l_partkey AS pb
         |  FROM items a JOIN items b
         |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         |  GROUP BY 1, 2 HAVING count(*) >= 2),
         |sym AS MATERIALIZED (
         |  SELECT pa AS src, pb AS dst FROM und
         |  UNION ALL SELECT pb, pa FROM und),
         |nv AS (SELECT CAST(count(DISTINCT n) AS BIGINT) AS n_nodes
         |       FROM (SELECT src AS n FROM sym
         |             UNION ALL SELECT dst FROM sym)),
         |d0 AS (SELECT src AS seed, src AS node, CAST(0 AS BIGINT) AS dist
         |       FROM (SELECT src FROM sym GROUP BY src
         |             ORDER BY count(*) DESC, src ASC
         |             LIMIT $ClosenessSeeds)),
         |$rounds
         |SELECT seed, count(*) AS n_reached,
         |  CAST(sum(dist) AS BIGINT) AS sum_dist,
         |  CASE WHEN sum(dist) > 0
         |    THEN CAST(floor(CAST((count(*) - 1) * (count(*) - 1) AS DOUBLE)
         |      * 1e6 / ((nv.n_nodes - 1) * sum(dist)) + 0.5) AS BIGINT)
         |    ELSE 0 END AS closeness_micro
         |FROM d$ClosenessRounds CROSS JOIN nv
         |GROUP BY seed, nv.n_nodes""".stripMargin
    },
    "graph_sssp" -> {
      // MATERIALIZED for the same inlining-blowup reason as graph_hits:
      // each round references d{i-1} twice
      val rounds = (1 to SsspRounds).map { i =>
        s"""d$i AS MATERIALIZED (
           |  SELECT node, min(dist_micro) AS dist_micro FROM (
           |    SELECT node, dist_micro FROM d${i - 1}
           |    UNION ALL
           |    SELECT s.dst AS node, p.dist_micro + s.w AS dist_micro
           |    FROM sym s JOIN d${i - 1} p ON p.node = s.src)
           |  GROUP BY node)""".stripMargin
      }.mkString(",\n")
      s"""WITH items AS (
         |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |und AS (
         |  SELECT a.l_partkey AS pa, b.l_partkey AS pb,
         |    CAST(1000000 // count(*) AS BIGINT) AS w
         |  FROM items a JOIN items b
         |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         |  GROUP BY 1, 2 HAVING count(*) >= 2),
         |sym AS MATERIALIZED (
         |  SELECT pa AS src, pb AS dst, w FROM und
         |  UNION ALL SELECT pb, pa, w FROM und),
         |d0 AS (SELECT src AS node, CAST(0 AS BIGINT) AS dist_micro
         |       FROM (SELECT src FROM sym GROUP BY src
         |             ORDER BY count(*) DESC, src ASC LIMIT 1)),
         |$rounds
         |SELECT node AS part_id, CAST(dist_micro AS BIGINT) AS dist_micro
         |FROM d$SsspRounds""".stripMargin
    })
}
