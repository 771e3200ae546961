package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.MisraGriesAggregator

/** Approximate/sketch aggregates ([EXT]): HyperLogLog distinct counts
  * and t-digest-style quantiles. These are the aggregates that make
  * 100 TB interactive: fixed-size mergeable state (KB per group)
  * instead of exact distinct's shuffle of every key.
  *
  * `hll_merge` demonstrates the canonical warehouse pattern: sketches
  * (register tables) are built per fine-grained cell (event_type ×
  * day — in production, per partition/file at ingest), persisted, then
  * MERGED later by register-wise max to answer coarser rollups without
  * rescanning raw data. The merge is associative — exactly the
  * partial-aggregation shape Spark's hash aggregate exploits.
  *
  * Every sketch here — registers AND estimates — is built over
  * md5-derived hashes, so the full family reproduces bit-for-bit in
  * DuckDB and takes the hash gate; SketchesSpec additionally asserts
  * the estimates land within the sketches' published error bounds of
  * the exact answers.
  */
object Sketches {

  /** HLL register count m = 2^8. rsd = 1.04/sqrt(256) ≈ 6.5% — sized
    * so the whole register table stays SQL-unrollable for the oracle;
    * production would raise p (the plan shape is p-independent).
    */
  val HllM = 256

  /** alpha_m · m² for m=256 — the exact same double both engines
    * produce from this literal formula (÷256 and ×65536 are exact
    * power-of-two ops; the single 0.7213/(1+…) division rounds
    * identically under IEEE 754).
    */
  private val HllAlphaM2: Double = (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0

  /** md5-derived 48-bit hash of the user key — the same
    * DuckDB-reproducible construction as the MinHash / CMS / KMV
    * sketches (`('0x' || substr(md5(x),1,12))::UBIGINT`).
    */
  private def hllHash(c: Column): Column =
    conv(substring(md5(concat(lit("hll:"), c.cast("string"))), 1, 12), 16, 10)
      .cast("long")

  /** (register index, rank) of one hash: j = low 8 bits, rho = 1 +
    * leading-zero count of the remaining 40-bit window ∈ [1, 41].
    * Bit-length is computed by OR-smearing + bit_count — pure integer
    * ops with identical semantics in Spark and DuckDB (no float log2
    * whose last-ulp could differ between libms). w = 0 smears to 0 →
    * bit_count 0 → rho 41, the correct all-zeros rank.
    */
  private def hllRegRho(h: Column): (Column, Column) = {
    val j = pmod(h, lit(HllM))
    val w0 = shiftrightunsigned(h, 8)
    val s = Seq(1, 2, 4, 8, 16, 32).foldLeft(w0) { (w, k) =>
      w.bitwiseOR(shiftrightunsigned(w, k))
    }
    (j, lit(41) - bit_count(s))
  }

  /** Register table (groupKeys..., j, m_j) for one grouping — the
    * mergeable sketch state: ≤ m rows per group, built by one
    * map-side-combinable max aggregation. Union of sketches is
    * register-wise max — re-aggregate this table at any coarser
    * grouping with max(m_j).
    */
  private def hllRegisters(in: DataFrame, keyCol: Column,
      groupKeys: Seq[String]): DataFrame = {
    val (j, rho) = hllRegRho(hllHash(keyCol))
    in.select(groupKeys.map(col) :+ j.as("j") :+ rho.as("rho"): _*)
      .groupBy((groupKeys :+ "j").map(col): _*)
      .agg(max("rho").as("m_j"))
  }

  /** Cardinality estimate per group from a register table. The raw
    * estimator alpha·m²/Z is bit-deterministic: Z sums exact powers of
    * two spanning < 53 bits of exponent, so the double sum is exact in
    * any order; the linear-counting branch (ln over ≤ m rational
    * inputs) is the one float op, guarded by the final
    * round-to-integer. Estimates are BIGINT counts.
    */
  private def hllEstimate(regs: DataFrame, groupKeys: Seq[String],
      outName: String): DataFrame =
    regs.groupBy(groupKeys.map(col): _*)
      .agg(count(lit(1)).as("m_present"),
        expr("sum(1.0 / cast(shiftleft(cast(1 as bigint), m_j) as double))")
          .as("z_present"))
      .withColumn("v_zero", lit(HllM.toLong) - col("m_present"))
      .withColumn("raw_est",
        lit(HllAlphaM2) / (col("z_present") + col("v_zero").cast("double")))
      .withColumn("est",
        when(col("raw_est") <= lit(2.5 * HllM) && col("v_zero") > 0,
          lit(HllM.toDouble) * log(lit(HllM.toDouble) / col("v_zero").cast("double")))
          .otherwise(col("raw_est")))
      .select(groupKeys.map(col) :+
        floor(col("est") + lit(0.5)).cast("long").as(outName): _*)

  /** Per event_type: exact row count, deterministic-HLL distinct
    * users, and the exact distinct count alongside — the error is part
    * of the output contract. The md5-register HLL replaces the
    * Datasketches `approx_count_distinct` demo so the ENTIRE sketch —
    * registers and estimate — sits under the DuckDB hash gate
    * (`hll_sketch_agg`/`approx_count_distinct` remain the drop-in
    * production alternates; the plan shape is identical).
    */
  def approxDistinct(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val est = hllEstimate(
      hllRegisters(ev, col("user_id"), Seq("event_type")),
      Seq("event_type"), "approx_users")
    ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        countDistinct("user_id").as("exact_users"))
      .join(est, "event_type")
      .select("event_type", "n", "approx_users", "exact_users")
  }

  /** Two-level sketch rollup: build the register table per
    * (event_type, day) — the sketch a production ingest job would
    * persist, ≤ 256 rows per cell — then union-merge to event_type by
    * register-wise max and estimate. Build and merge are separate
    * aggregations: at scale the first runs at ingest, the second at
    * query time without rescanning raw data. max is associative, so
    * merge-then-estimate ≡ one sketch over all rows (spec-asserted).
    */
  def hllMerge(s: SparkSession, d: String): DataFrame = {
    val daily = hllRegisters(
      Tables.events(s, d).withColumn("day", expr("ts DIV 86400000000000")),
      col("user_id"), Seq("event_type", "day"))
    val merged = daily.groupBy("event_type", "j").agg(max("m_j").as("m_j"))
    daily.select("event_type", "day").distinct()
      .groupBy("event_type").agg(count(lit(1)).as("n_days"))
      .join(hllEstimate(merged, Seq("event_type"), "merged_users"), "event_type")
      .select("event_type", "n_days", "merged_users")
  }

  /** SLIDING-WINDOW distinct counting via sketch merge — the 100 TB
    * path for [[graft.queries.Stickiness]]-style trailing actives:
    * per-day HLL register tables are built ONCE at ingest, and any
    * trailing window (7 days here) is answered by register-wise max
    * over the window — raw user ids are never revisited. Window
    * membership is equi-ized exactly like dau_mau (each day's
    * registers contribute to the ≤7 report days). Output per
    * observed day: exact daily distinct (the audit column) and the
    * merged 7-day HLL estimate.
    */
  def hllWindow(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .withColumn("day", expr("ts DIV 86400000000000"))
    val daily = hllRegisters(ev, col("user_id"), Seq("day"))
    val days = daily.select("day").distinct()
    val contrib = daily
      .select(col("j"), col("m_j"), explode(expr("sequence(day, day + 6)")).as("day"))
      .join(days, Seq("day"), "left_semi")
      .groupBy("day", "j").agg(max("m_j").as("m_j"))
    val exact = ev.groupBy("day")
      .agg(countDistinct("user_id").as("users_day_exact"))
    exact.join(hllEstimate(contrib, Seq("day"), "users_7d_hll"), "day")
  }

  /** Global-count threshold for [[heavyHitters]]; mirrored in the
    * oracle's HAVING clause.
    */
  val HeavyHitterThreshold = 500L

  /** EXACT heavy hitters (tokens with global count >= T) via the
    * classic two-pass candidate/verify plan — the shape that survives
    * a vocabulary too large to shuffle:
    *
    * Pass 1 candidates: each input partition counts its own tokens
    * and emits only those with local count >= floor(T/P) (P = input
    * partition count). Pigeonhole: a token with global count >= T
    * must reach that local count in at least one of P partitions, so
    * the filter cannot lose a true heavy hitter — the candidate set
    * is a guaranteed superset. This stage runs INSIDE mapPartitions
    * because it is the one plan shape Catalyst cannot express: a
    * count-based filter applied BEFORE any shuffle (a groupBy's
    * map-side partial agg still ships every distinct key). The
    * candidate stage runs on at most T/[[MinLocalFloor]] partitions
    * (narrow coalesce when the scan is wider), so the local threshold
    * never degrades below the floor and the web-scale singleton tail
    * (the 10⁸–10⁹ typo/URL tokens that appear a handful of times) can
    * never flood the broadcast; worst-case candidate volume is
    * n/[[MinLocalFloor]] (every token exactly at the local threshold),
    * typical volume is the tokens with a partition-local count >= the
    * floor — a tiny head. Per-partition memory is the
    * local distinct-token map — the same class as Spark's own hash-agg
    * partial map, sized by `files.maxPartitionBytes`; a Misra-Gries
    * summary (k counters, guarantees survivors above n_p/k) is the
    * bounded-memory refinement when even that map is too big.
    *
    * Pass 2 verify: re-scan, semi-join tokens against the broadcast
    * candidate set (map-side, no shuffle of the token stream beyond
    * the surviving candidates), exact groupBy count, HAVING >= T.
    * Result is EXACTLY `GROUP BY tok HAVING count(*) >= T` — DuckDB
    * hash-gate applies despite the sketch-flavored plan.
    */
  def heavyHitters(s: SparkSession, d: String): DataFrame =
    heavyHittersOn(Tables.documents(s, d))

  /** Minimum per-partition threshold the candidate stage is allowed to
    * degrade to. With minLocal = floor(T/P), a partition count P >= T
    * would drive minLocal to 1 and the "prefilter" would pass the
    * ENTIRE vocabulary into the broadcast — the exact failure this
    * plan exists to avoid. Capping the candidate stage at T/floor
    * partitions (a narrow coalesce, no shuffle) keeps minLocal >=
    * floor at any input partitioning. The pigeonhole guarantee is
    * per-ACTUAL-partition, so exactness is unaffected by the coalesce.
    * In production the threshold scales with the corpus (heavy hitters
    * at 100 TB are ppm-scale counts, T ~ 10⁶+), so T/floor partitions
    * is plentiful parallelism precisely when the corpus is large; the
    * fixed T=500 here only pins the test-scale contract.
    */
  val MinLocalFloor = 16L

  /** Core of [[heavyHitters]] over any (doc_id, text) DataFrame. */
  def heavyHittersOn(documents: DataFrame): DataFrame = {
    val s = documents.sparkSession
    import s.implicits._
    val toks = documents
      .select(explode(Dedup.tokensCol(col("text"))).as("tok"))
    val maxP = math.max(1, (HeavyHitterThreshold / MinLocalFloor).toInt)
    val toksC =
      if (toks.rdd.getNumPartitions > maxP) toks.coalesce(maxP) else toks
    val p = math.max(1, toksC.rdd.getNumPartitions)
    val minLocal = math.max(1L, HeavyHitterThreshold / p)
    val candidates = toksC.as[String].mapPartitions { it =>
      val m = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach(t => m.update(t, m.getOrElse(t, 0L) + 1L))
      m.iterator.collect { case (t, n) if n >= minLocal => t }
    }.toDF("tok").distinct()
    toks.join(broadcast(candidates), "tok")
      .groupBy("tok")
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= HeavyHitterThreshold)
  }

  /** Floor for the Misra-Gries counter budget of [[heavyHittersMg]];
    * the actual k is DERIVED per run as max(floor, 4·n/T) from a
    * map-only token-count sizing pass, so the undercount bound
    * n/(k+1) sits at ~T/4 at any corpus size instead of silently
    * outgrowing a constant. The cap bounds counter memory (4M
    * counters ≈ low hundreds of MB); beyond cap·T/4 tokens the
    * threshold itself must scale (heavy hitters at 100 TB are
    * ppm-scale counts, T ~ 10⁶+ — same production contract as
    * [[heavyHitters]]), and the aggregator's finish assert stays the
    * loud guard against a misconfigured pair.
    */
  val MgCounters = 4096
  val MgCountersCap = 1 << 22

  /** Same exact contract as [[heavyHitters]] (identical oracle SQL),
    * different candidate mechanism: a mergeable Misra-Gries summary
    * ([[graft.functions.MisraGriesAggregator]]) replaces the exact
    * per-partition hash map. Memory is O(k) counters per task
    * INDEPENDENT of the vocabulary — the shape that survives when
    * even one partition's distinct-token map would spill. The
    * undercount bound (<= n/(k+1)) widens the candidate set slightly;
    * the broadcast-verify pass (map-side semi join, exact HAVING)
    * collapses it back to exactly `GROUP BY tok HAVING count >= T`.
    */
  def heavyHittersMg(s: SparkSession, d: String): DataFrame =
    heavyHittersMgOn(Tables.documents(s, d))

  /** Core of [[heavyHittersMg]] over any (doc_id, text) DataFrame. */
  def heavyHittersMgOn(documents: DataFrame): DataFrame = {
    val s = documents.sparkSession
    import s.implicits._
    // sizing pass: map-only tokenize + 1-row sum (no shuffle of tokens)
    val n = documents
      .select(coalesce(sum(size(Dedup.tokensCol(col("text")))), lit(0L)).as("n"))
      .first().getLong(0)
    val k = math.min(MgCountersCap.toLong,
      math.max(MgCounters.toLong, 4L * n / HeavyHitterThreshold)).toInt
    val toks = documents
      .select(explode(Dedup.tokensCol(col("text"))).as("tok"))
    val candidates = toks.as[String]
      .select(MisraGriesAggregator.frequentCandidates(k, HeavyHitterThreshold))
      .toDF("cands")
      .select(explode(col("cands")).as("tok"))
    toks.join(broadcast(candidates), "tok")
      .groupBy("tok")
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= HeavyHitterThreshold)
  }

  /** KMV sketch size for [[audienceOverlap]] (rel. error ~1/√k ≈ 6%). */
  val KmvK = 256

  /** Pairwise audience overlap between event types via KMV/theta
    * sketches — the set-INTERSECTION estimate HLL cannot provide.
    * One pass builds an O(k) sketch per type (map-side mergeable
    * typed aggregator — user sets never shuffle, only k-double
    * arrays); the pair stage is a self-join of the 5-row sketch
    * table, all array ops. θ = k-th min of the merged pair sketch;
    * below θ every sketch is a uniform sample of its set, so
    * |A∪B| ≈ (k−1)/θ and |A∩B| ≈ |{x ∈ A∩B : x < θ}|/θ. Sketches
    * smaller than k hold their ENTIRE set — those pairs compute
    * exact counts (θ = 1 branch).
    */
  def audienceOverlap(s: SparkSession, d: String): DataFrame =
    audienceOverlapOn(Tables.events(s, d), KmvK)

  def audienceOverlapOn(events: DataFrame, k: Int): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    // md5-derived uniform hash in (0,1) — the quantile_sketch trick:
    // (first 48 md5 bits + 0.5) / 2^48 reproduces bit-for-bit in
    // DuckDB, so BOTH overlap modes (θ-estimate and exact sub-k) sit
    // under the driver oracle; 48-bit granularity keeps collision
    // probability ~n²/2⁴⁹ — negligible and hash-deterministic.
    val sk = events
      .select(col("event_type"),
        ((conv(substring(md5(concat(lit("kmv:"), col("user_id").cast("string"))), 1, 12),
          16, 10).cast("long").cast("double") + 0.5) / 281474976710656.0).as("h"))
      .as[(String, Double)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(graft.functions.KmvAggregator.sketch(k).name("sk"))
      .toDF("event_type", "sk")
    val a = sk.select(col("event_type").as("type_a"), col("sk").as("ska"))
    val b = sk.select(col("event_type").as("type_b"), col("sk").as("skb"))
    val merged = slice(array_sort(array_distinct(concat(col("ska"), col("skb")))), 1, k)
    val pairs = a.join(b, col("type_a") < col("type_b"))
      .withColumn("m", merged)
      .withColumn("full", size(col("m")) === k)
      .withColumn("theta",
        when(col("full"), element_at(col("m"), k)).otherwise(lit(1.0)))
      .withColumn("inter_raw",
        size(filter(array_intersect(col("ska"), col("skb")),
          x => x < col("theta"))).cast("double"))
    // floor(x*1e4+0.5)/1e4, not round(): both engines round the same
    // IEEE value identically (see qualityScore) — required for the
    // exact-mode oracle row, harmless for the estimates
    val fl = (c: Column) => floor(c * 10000 + 0.5) / 10000.0
    val union = when(col("full"), lit((k - 1).toDouble) / col("theta"))
      .otherwise(size(col("m")).cast("double"))
    pairs.select(col("type_a"), col("type_b"),
      fl(union).as("est_union"),
      fl(col("inter_raw") / col("theta")).as("est_overlap"),
      fl((col("inter_raw") / col("theta")) / union).as("est_jaccard"))
  }

  /** KMV sketch size for [[audienceOverlapExact]]: far above the pair
    * union cardinality through sf0.1 (~3k users/pair), so every sketch
    * stays in the sub-k regime where it holds its ENTIRE hashed set.
    */
  val KmvExactK = 4096

  /** [[audienceOverlapOn]] operated in its exact sub-k mode: with
    * k > |A∪B| the θ=1 branch counts distinct 64-bit hashes directly,
    * so union/intersection/Jaccard are exact set algebra (collision
    * probability ~n²/2⁶⁴ — negligible and hash-deterministic), and the
    * row carries a full DuckDB oracle over distinct (event_type,
    * user_id) pairs. Past k the SAME plan degrades gracefully into the
    * θ-estimate path — k is the documented exactness contract, not a
    * correctness cliff.
    */
  def audienceOverlapExact(s: SparkSession, d: String): DataFrame =
    audienceOverlapOn(Tables.events(s, d), KmvExactK)

  /** Bottom-k sample size for [[quantileSketch]]. */
  val QuantK = 64

  /** Mergeable per-source quantile sketch
    * ([[graft.functions.QuantileSketchAggregator]]): deterministic
    * bottom-[[QuantK]]-by-md5 row sample, discrete quantiles read from
    * the sample — p50/p90/p99 of document token counts per source.
    * The sample membership depends only on hash order, so the
    * estimates are exactly reproducible across partitionings and
    * engines: this quantile sketch carries a FULL DuckDB oracle
    * (rank-≤k selection + 1-indexed ⌈q·n⌉ pick), which
    * ingestion-order-dependent sketches (t-digest/KLL) cannot.
    * O(k) state per group; map-side partial aggregation; rank error
    * O(1/√k). Sources smaller than k answer exactly.
    */
  /** The sketch + quantile-pick core over prepared (source, h, ntok)
    * rows — shared verbatim by the batch query and the streaming
    * complete-mode twin ([[graft.streaming.StreamingOps
    * .quantileStream]]): hash-order membership makes the sample — and
    * hence every estimate — independent of how rows arrive, so the
    * stream equals the batch EXACTLY at every trigger that has seen
    * the same rows.
    */
  private[graft] def quantileOf(
      rows: org.apache.spark.sql.Dataset[(String, Double, Long)]): DataFrame = {
    val sess = rows.sparkSession
    import sess.implicits._
    val pick = (q: Double) =>
      element_at(col("vals"), ceil(lit(q) * size(col("vals"))).cast("int"))
    rows
      .groupByKey(_._1).mapValues(t => (t._2, t._3))
      .agg(graft.functions.QuantileSketchAggregator.sketch(QuantK).name("vals"))
      .toDF("source", "vals")
      .select(col("source"), size(col("vals")).as("n_sample"),
        pick(0.5).as("p50"), pick(0.9).as("p90"), pick(0.99).as("p99"))
  }

  def quantileSketch(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    quantileOf(Tables.documents(s, d)
      .select(col("source"),
        ((conv(substring(md5(concat(lit("qsk:"), col("doc_id").cast("string"))), 1, 12),
          16, 10).cast("double") + lit(0.5)) / lit(281474976710656.0)).as("h"),
        size(Dedup.tokensCol(col("text"))).cast("long").as("ntok"))
      .as[(String, Double, Long)])
  }

  /** CMS grid shape for [[cmsFreq]]: 4 × 256 (ε = e/256 ≈ 1.1%·n
    * overcount bound, δ = e^−4 ≈ 1.8%).
    */
  val CmsDepth = 4
  val CmsWidth = 256

  /** Count-Min point-frequency estimates for the exact top-20 tokens,
    * alongside their true counts — the frequency-sketch audit a
    * pipeline runs before trusting CMS estimates downstream.
    *
    * TWO forms of the sketch exist deliberately:
    * [[graft.functions.CountMinAggregator]] is the at-scale streaming
    * form (one xxhash64 per arrival, Kirsch–Mitzenmacher row
    * derivation, mergeable O(d·w) state — certified by CountMinSpec);
    * THIS query is its declarative twin with md5-derived row slots
    * (the mdUniform convention), whose grid arithmetic reproduces
    * bit-for-bit in DuckDB — so unlike most approximate sketches the
    * ESTIMATES themselves take the full hash gate: the oracle builds
    * the same d×w grid and must produce identical n_est per token.
    *
    * Scale design: one vocabulary-collapse shuffle (token counts),
    * then d·|vocab| narrow cell rows partial-agg'd down to the d·w
    * grid — the grid, not the vocabulary, crosses the final exchange;
    * probes join against d·w rows. The estimate NEVER undercounts
    * (min over rows each ≥ the true slot mass).
    */
  def cmsFreq(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val counts = docs
      .select(explode(Dedup.tokensCol(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
    def slot(row: Int, tok: Column): Column =
      pmod(conv(substring(md5(concat_ws(":", lit(row), tok)), 1, 12), 16, 10)
        .cast("long"), lit(CmsWidth))
    def rowSlots(tok: Column): Column = explode(array(
      (0 until CmsDepth).map(i =>
        struct(lit(i).as("row"), slot(i, tok).as("slot"))): _*))
    val cells = counts
      .select(col("c"), rowSlots(col("tok")).as("rs"))
      .groupBy(col("rs.row").as("row"), col("rs.slot").as("slot"))
      .agg(sum(col("c")).as("rc"))
    // top-20 via sort+limit → TakeOrderedAndProject (per-partition
    // heaps + driver merge of 20-row tops), not a single-task window
    val probes = counts.orderBy(col("c").desc, col("tok").asc).limit(20)
      .select(col("tok"), col("c").as("n_exact"))
    probes
      .select(col("tok"), col("n_exact"), rowSlots(col("tok")).as("rs"))
      .select(col("tok"), col("n_exact"),
        col("rs.row").as("row"), col("rs.slot").as("slot"))
      .join(cells, Seq("row", "slot"))
      .groupBy(col("tok"), col("n_exact"))
      .agg(min(col("rc")).as("n_est"))
      .select(col("tok"), col("n_exact"), col("n_est"),
        (col("n_est") - col("n_exact")).as("overcount"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cms_freq" -> cmsFreq,
    "quantile_sketch" -> quantileSketch,
    "audience_overlap" -> audienceOverlap,
    "audience_overlap_exact" -> audienceOverlapExact,
    "approx_distinct" -> approxDistinct,
    "heavy_hitters" -> heavyHitters,
    "heavy_hitters_mg" -> heavyHittersMg,
    "hll_merge" -> hllMerge,
    "hll_window" -> hllWindow)

  /** DuckDB twin of [[hllRegisters]] + [[hllEstimate]]: the md5/smear/
    * bit_count register chain and the rational raw estimator reproduce
    * bit-for-bit (see the determinism notes on the Scala side), so the
    * HLL family takes the full hash gate like the CMS/KMV sketches.
    * `keys` = comma-joined group columns present in CTE `src`.
    */
  private def hllChainSql(src: String, keys: String): String =
    s"""hh AS (SELECT $keys,
       |  CAST(('0x' || substr(md5('hll:' || CAST(user_id AS VARCHAR)), 1, 12))::UBIGINT
       |       AS BIGINT) AS h
       |  FROM $src),
       |hb AS (SELECT $keys, h % 256 AS j, h // 256 AS w FROM hh),
       |hs1 AS (SELECT $keys, j, w | (w >> 1) AS w FROM hb),
       |hs2 AS (SELECT $keys, j, w | (w >> 2) AS w FROM hs1),
       |hs4 AS (SELECT $keys, j, w | (w >> 4) AS w FROM hs2),
       |hs8 AS (SELECT $keys, j, w | (w >> 8) AS w FROM hs4),
       |hs16 AS (SELECT $keys, j, w | (w >> 16) AS w FROM hs8),
       |hs32 AS (SELECT $keys, j, w | (w >> 32) AS w FROM hs16),
       |hreg AS (SELECT $keys, j, max(41 - bit_count(w)) AS m_j
       |         FROM hs32 GROUP BY ALL)""".stripMargin

  /** Estimate tail over a register CTE grouped to `keys`: emits
    * ($keys, $outName BIGINT).
    */
  private def hllEstSql(regSrc: String, keys: String, outName: String): String =
    s"""he AS (SELECT $keys, count(*) AS m_present,
       |  sum(1.0 / CAST((1::BIGINT << m_j) AS DOUBLE)) AS z_present
       |  FROM $regSrc GROUP BY ALL),
       |hz AS (SELECT $keys, 256 - m_present AS v_zero,
       |  ((0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0)
       |    / (z_present + CAST(256 - m_present AS DOUBLE)) AS raw_est
       |  FROM he),
       |hf AS (SELECT $keys,
       |  CAST(floor(CASE WHEN raw_est <= 640.0 AND v_zero > 0
       |    THEN 256.0 * ln(256.0 / CAST(v_zero AS DOUBLE))
       |    ELSE raw_est END + 0.5) AS BIGINT) AS $outName
       |  FROM hz)""".stripMargin

  /** The whole sketch surface — including the HLL register tables and
    * estimates, the KMV θ-ESTIMATES (audience_overlap) and the CMS
    * estimates — is hash-deterministic via md5-derived hashes and
    * takes the full gate.
    */
  def oracleSql: Map[String, String] = Map(
    "hll_window" ->
      s"""WITH src AS (
         |  SELECT CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT)
         |    AS day, user_id
         |  FROM events),
         |${hllChainSql("src", "day")},
         |days AS (SELECT DISTINCT day FROM hreg),
         |contrib AS (
         |  SELECT g.day, j, max(m_j) AS m_j
         |  FROM hreg, unnest(generate_series(hreg.day, hreg.day + 6)) AS g(day)
         |  WHERE g.day IN (SELECT day FROM days)
         |  GROUP BY 1, 2),
         |${hllEstSql("contrib", "day", "users_7d_hll")},
         |ex AS (SELECT day, CAST(count(DISTINCT user_id) AS BIGINT)
         |         AS users_day_exact
         |       FROM src GROUP BY 1)
         |SELECT ex.day, ex.users_day_exact, hf.users_7d_hll
         |FROM ex JOIN hf USING (day)""".stripMargin,
    "approx_distinct" ->
      s"""WITH ${hllChainSql("events", "event_type")},
         |${hllEstSql("hreg", "event_type", "approx_users")},
         |ex AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |         CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users
         |       FROM events GROUP BY 1)
         |SELECT ex.event_type, ex.n, hf.approx_users, ex.exact_users
         |FROM ex JOIN hf USING (event_type)""".stripMargin,
    "hll_merge" ->
      s"""WITH ev AS (SELECT event_type,
         |  CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT) AS day,
         |  user_id FROM events),
         |${hllChainSql("ev", "event_type, day")},
         |hmerged AS (SELECT event_type, j, max(m_j) AS m_j
         |            FROM hreg GROUP BY 1, 2),
         |${hllEstSql("hmerged", "event_type", "merged_users")},
         |nd AS (SELECT event_type, CAST(count(DISTINCT day) AS BIGINT) AS n_days
         |       FROM hreg GROUP BY 1)
         |SELECT nd.event_type, nd.n_days, hf.merged_users
         |FROM nd JOIN hf USING (event_type)""".stripMargin,
    // The md5-slot CMS reproduces bit-for-bit: same grid, same
    // estimates — the sketch itself is under the hash gate.
    "cms_freq" ->
      s"""WITH tokc AS (
         |  SELECT tok, CAST(count(*) AS BIGINT) AS c FROM (
         |    SELECT unnest(list_filter(string_split_regex(text, '[^\\p{L}]+'),
         |                              x -> len(x) > 0)) AS tok
         |    FROM documents)
         |  GROUP BY tok),
         |rs AS (SELECT CAST(unnest(generate_series(0, ${CmsDepth - 1})) AS INTEGER) AS row),
         |cells AS MATERIALIZED (
         |  SELECT rs.row,
         |    CAST(('0x' || substr(md5(CAST(rs.row AS VARCHAR) || ':' || t.tok), 1, 12))::UBIGINT
         |         % $CmsWidth AS BIGINT) AS slot,
         |    sum(t.c) AS rc
         |  FROM tokc t CROSS JOIN rs
         |  GROUP BY 1, 2),
         |probes AS (
         |  SELECT tok, c AS n_exact FROM tokc
         |  ORDER BY c DESC, tok LIMIT 20)
         |SELECT p.tok, p.n_exact,
         |  CAST(min(ce.rc) AS BIGINT) AS n_est,
         |  CAST(min(ce.rc) - p.n_exact AS BIGINT) AS overcount
         |FROM probes p CROSS JOIN rs
         |JOIN cells ce ON ce.row = rs.row
         | AND ce.slot = CAST(('0x' || substr(md5(CAST(rs.row AS VARCHAR) || ':' || p.tok), 1, 12))::UBIGINT
         |                    % $CmsWidth AS BIGINT)
         |GROUP BY p.tok, p.n_exact""".stripMargin,
    "quantile_sketch" ->
      s"""WITH u AS (SELECT source,
         |  (CAST(('0x' || substr(md5('qsk:' || CAST(doc_id AS VARCHAR)), 1, 12))::UBIGINT
         |        AS DOUBLE) + 0.5) / 281474976710656.0 AS h,
         |  CAST(len(list_filter(string_split_regex(text, '[^\\p{L}]+'),
         |                       x -> len(x) > 0)) AS BIGINT) AS ntok
         |  FROM documents),
         |r AS (SELECT source, ntok,
         |        row_number() OVER (PARTITION BY source ORDER BY h) AS rn
         |      FROM u),
         |g AS (SELECT source, list(ntok ORDER BY ntok) AS vals
         |      FROM r WHERE rn <= $QuantK GROUP BY source)
         |SELECT source, CAST(len(vals) AS INTEGER) AS n_sample,
         |  vals[CAST(ceil(0.5 * len(vals)) AS INTEGER)] AS p50,
         |  vals[CAST(ceil(0.9 * len(vals)) AS INTEGER)] AS p90,
         |  vals[CAST(ceil(0.99 * len(vals)) AS INTEGER)] AS p99
         |FROM g""".stripMargin,
    // θ-estimate mode under the hash gate: the md5-derived uniform
    // hashes reproduce bit-for-bit, so the bottom-k sketches, θ, and
    // every estimate are the SAME IEEE doubles in both engines.
    "audience_overlap" ->
      s"""WITH uh AS (
         |  SELECT DISTINCT event_type,
         |    (CAST(('0x' || substr(md5('kmv:' || CAST(user_id AS VARCHAR)), 1, 12))::UBIGINT
         |          AS DOUBLE) + 0.5) / 281474976710656.0 AS h
         |  FROM events),
         |r AS (SELECT event_type, h,
         |        row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
         |      FROM uh),
         |sk AS (SELECT event_type, list(h ORDER BY h) AS sk
         |       FROM r WHERE rn <= $KmvK GROUP BY event_type),
         |p AS (
         |  SELECT a.event_type AS type_a, b.event_type AS type_b,
         |    list_sort(list_distinct(a.sk || b.sk))[1:$KmvK] AS m,
         |    a.sk AS ska, b.sk AS skb
         |  FROM sk a JOIN sk b ON a.event_type < b.event_type),
         |q AS (
         |  SELECT type_a, type_b, ska, skb, m,
         |    CASE WHEN len(m) = $KmvK THEN m[$KmvK] ELSE 1.0 END AS theta,
         |    len(m) = $KmvK AS isfull
         |  FROM p),
         |e AS (
         |  SELECT type_a, type_b, theta,
         |    CAST(len(list_filter(list_intersect(ska, skb), x -> x < theta))
         |         AS DOUBLE) AS inter_raw,
         |    CASE WHEN isfull THEN ${(KmvK - 1).toDouble} / theta
         |         ELSE CAST(len(m) AS DOUBLE) END AS est_u
         |  FROM q)
         |SELECT type_a, type_b,
         |  floor(est_u * 10000 + 0.5) / 10000.0 AS est_union,
         |  floor(inter_raw / theta * 10000 + 0.5) / 10000.0 AS est_overlap,
         |  floor((inter_raw / theta) / est_u * 10000 + 0.5) / 10000.0 AS est_jaccard
         |FROM e""".stripMargin,
    "audience_overlap_exact" ->
      """WITH u AS (SELECT DISTINCT event_type, user_id FROM events),
        |c AS (SELECT event_type, count(*) AS n FROM u GROUP BY event_type),
        |i AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
        |             count(*) AS ninter
        |      FROM u a JOIN u b
        |        ON a.user_id = b.user_id AND a.event_type < b.event_type
        |      GROUP BY 1, 2)
        |SELECT ca.event_type AS type_a, cb.event_type AS type_b,
        |  floor(CAST(ca.n + cb.n - coalesce(i.ninter, 0) AS DOUBLE) * 10000 + 0.5)
        |    / 10000.0 AS est_union,
        |  floor(CAST(coalesce(i.ninter, 0) AS DOUBLE) * 10000 + 0.5)
        |    / 10000.0 AS est_overlap,
        |  floor(CAST(coalesce(i.ninter, 0) AS DOUBLE)
        |          / (ca.n + cb.n - coalesce(i.ninter, 0)) * 10000 + 0.5)
        |    / 10000.0 AS est_jaccard
        |FROM c ca
        |JOIN c cb ON ca.event_type < cb.event_type
        |LEFT JOIN i ON i.type_a = ca.event_type AND i.type_b = cb.event_type""".stripMargin,
    "heavy_hitters_mg" ->
      """WITH toks AS (
        |  SELECT unnest(list_filter(string_split_regex(text, '[^\p{L}]+'),
        |                            x -> len(x) > 0)) AS tok
        |  FROM documents)
        |SELECT tok, count(*) AS n FROM toks
        |GROUP BY tok HAVING count(*) >= 500""".stripMargin,
    "heavy_hitters" ->
      """WITH toks AS (
        |  SELECT unnest(list_filter(string_split_regex(text, '[^\p{L}]+'),
        |                            x -> len(x) > 0)) AS tok
        |  FROM documents)
        |SELECT tok, count(*) AS n FROM toks
        |GROUP BY tok HAVING count(*) >= 500""".stripMargin)
}
