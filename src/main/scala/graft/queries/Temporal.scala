package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Temporal join operators over `events` ([EXT] — the reference is
  * pure batch MapReduce with no joins at all, SURVEY.md §2.3): as-of
  * join and a bounded range (band) join, both expressed in their
  * 100 TB-scalable forms.
  *
  * Scale design: the naive formulation of both is an inequality
  * theta-join, which Spark (and every MPP) executes as
  * BroadcastNestedLoopJoin — O(n²) and a driver OOM at scale. Instead:
  *
  *  - As-of = union both sides tagged + ONE hash shuffle on user_id +
  *    a single ordered window carrying the right side forward
  *    (`last(_, ignoreNulls)`). Cost: one shuffle + one sort —
  *    identical asymptotics to a sort-merge join, no quadratic blowup,
  *    no broadcast. This is the standard MPP as-of idiom.
  *  - Band join (|Δt| bounded) = time-bucket both sides at the band
  *    width, replicate ONE side into its 2 candidate buckets (explode
  *    of 2 keys — bounded ×2 amplification), equi-join on
  *    (user, bucket), then exact predicate. Candidates ∝ true matches,
  *    never n².
  *
  * ts is epoch-nanos long (Tables.events); all emitted times are
  * epoch seconds/minutes as BIGINT so ns-vs-µs precision cannot skew
  * the oracle compare.
  */
object Temporal {

  private val NanosPerSec = 1000000000L

  /** As-of join: each purchase matched to the same user's most recent
    * click at-or-before it. Left outer (purchases with no prior click
    * keep NULL). Implemented as union + carry-forward window — one
    * shuffle on user_id, no inequality join.
    */
  def joinAsof(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"), lit(0).as("side"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"), lit(1).as("side"))
    // side asc ⇒ at equal ts the click sorts first ⇒ "at or before".
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionByName(purchases)
      .withColumn("asof_click", last(when(col("side") === 0, col("click_id")), ignoreNulls = true).over(w))
      .withColumn("asof_ts", last(when(col("side") === 0, col("ts")), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(
        col("click_id").as("purchase_id"),
        col("user_id"),
        // Integer DIV, never `/`: epoch-nanos exceed 2^53, double
        // division can flip the low bits (see Tables.events).
        expr(s"ts DIV $NanosPerSec").as("purchase_s"),
        col("asof_click").as("click_id"),
        expr(s"(ts - asof_ts) DIV $NanosPerSec").as("gap_s"))
  }

  /** Band (range) join: click→purchase conversion pairs — same user,
    * purchase within 10 minutes AFTER the click. Time-bucketed
    * candidate join: both sides keyed by 10-min bucket, purchases
    * replicated into (b-1, b), equi-join on (user, bucket), exact
    * band predicate last. No inequality join operator in the plan.
    */
  def joinRange(s: SparkSession, d: String): DataFrame = {
    val BandNs = 600L * NanosPerSec
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("cts"),
        expr(s"ts DIV $BandNs").as("bucket"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("pts"),
        explode(array(expr(s"ts DIV $BandNs") - 1, expr(s"ts DIV $BandNs"))).as("bucket"))
    clicks.join(purchases, Seq("user_id", "bucket"))
      .filter(col("pts") >= col("cts") && col("pts") - col("cts") <= BandNs)
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        expr(s"(pts - cts) DIV $NanosPerSec").as("gap_s"))
      .distinct()
  }

  /** [[joinAsof]]'s semantics through the CUSTOM PHYSICAL OPERATOR
    * ([[graft.plans.AsofJoinExec]] via the injected planner strategy):
    * SMJ-shaped exchanges+sorts, then one streaming merge pass per
    * partition with O(1) state — no union materialization, no window
    * buffer. Identical output ⇒ the same DuckDB oracle gates the
    * custom operator end to end.
    */
  def joinAsofExec(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("pts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("c_click"),
        col("ts").as("cts"))
    graft.plans.AsofJoin.asof(purchases, clicks,
        "user_id", "c_user", "pts", "cts")
      .select(col("purchase_id"), col("user_id"),
        expr(s"pts DIV $NanosPerSec").as("purchase_s"),
        col("c_click").as("click_id"),
        expr(s"(pts - cts) DIV $NanosPerSec").as("gap_s"))
  }

  /** FORWARD as-of through the custom operator: each click attributed
    * to the same user's EARLIEST purchase at-or-after it (next-event
    * conversion attribution) — the direction flip of [[joinAsofExec]],
    * same merge pass peeking the sorted right head instead of keeping
    * a trailing candidate.
    */
  def joinAsofFwd(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("cts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("p_purchase"),
        col("ts").as("pts"))
    graft.plans.AsofJoin.asof(clicks, purchases,
        "user_id", "p_user", "cts", "pts", forward = true)
      .select(col("click_id"), col("user_id"),
        expr(s"cts DIV $NanosPerSec").as("click_s"),
        col("p_purchase").as("purchase_id"),
        expr(s"(pts - cts) DIV $NanosPerSec").as("delay_s"))
  }

  /** [[joinAsofExec]] with a MAX-STALENESS TOLERANCE: a purchase only
    * attributes to a click within the last hour — the bound real
    * event attribution always carries (an ad click from last week must
    * not claim today's purchase). Same custom operator, same merge
    * pass; the candidate is discarded at emit time when older than the
    * tolerance, so purchases with only stale clicks keep NULLs.
    */
  def joinAsofTol(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("pts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("c_click"),
        col("ts").as("cts"))
    graft.plans.AsofJoin.asof(purchases, clicks,
        "user_id", "c_user", "pts", "cts",
        tolerance = Some(3600L * NanosPerSec))
      .select(col("purchase_id"), col("user_id"),
        expr(s"pts DIV $NanosPerSec").as("purchase_s"),
        col("c_click").as("click_id"),
        expr(s"(pts - cts) DIV $NanosPerSec").as("gap_s"))
  }

  /** NEAREST as-of: each purchase matched to the same user's click with
    * the smallest |Δt| in EITHER direction (pandas merge_asof
    * `direction='nearest'`) — the sensor-fusion/alignment form where
    * "most recent" is wrong half the time. Completes the direction
    * family: backward ([[joinAsof]]), forward ([[joinAsofFwd]]),
    * nearest. Ties (equal gap both ways) resolve backward; the output
    * carries the winning direction and the absolute gap (signed gaps
    * would hit the trunc-vs-floor integer-division split between
    * engines on negatives — abs sidesteps it by construction).
    *
    * Same scale envelope as [[joinAsof]]: union both sides tagged, ONE
    * hash shuffle on user_id, one sort, and two frame-bounded window
    * walks (carry-forward and carry-backward) — no inequality join, no
    * replication, O(1) window state per row. A third sort key
    * (event_id) pins tie order between equal-ts clicks so both engines
    * walk identical sequences.
    */
  def joinAsofNearest(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"), lit(0).as("side"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), lit(1).as("side"))
    val ord = Seq(col("ts"), col("side"), col("event_id"))
    val wb = Window.partitionBy("user_id").orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy("user_id").orderBy(ord: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val clickId = when(col("side") === 0, col("event_id"))
    val clickTs = when(col("side") === 0, col("ts"))
    val matched = clicks.unionByName(purchases)
      .withColumn("bid", last(clickId, ignoreNulls = true).over(wb))
      .withColumn("bts", last(clickTs, ignoreNulls = true).over(wb))
      .withColumn("fid", first(clickId, ignoreNulls = true).over(wf))
      .withColumn("fts", first(clickTs, ignoreNulls = true).over(wf))
      .filter(col("side") === 1)
    val bgap = col("ts") - col("bts")
    val fgap = col("fts") - col("ts")
    val takeBack = col("bts").isNotNull && (col("fts").isNull || bgap <= fgap)
    matched.select(
      col("event_id").as("purchase_id"),
      col("user_id"),
      expr(s"ts DIV $NanosPerSec").as("purchase_s"),
      when(takeBack, col("bid")).otherwise(col("fid")).as("click_id"),
      expr(s"(CASE WHEN bts IS NOT NULL AND (fts IS NULL OR ts - bts <= fts - ts)" +
        s" THEN ts - bts ELSE fts - ts END) DIV $NanosPerSec").as("gap_s"),
      when(takeBack, lit("back"))
        .otherwise(when(col("fts").isNotNull, lit("fwd"))).as("dir"))
  }

  /** Third as-of execution path: per-key SORTED HISTORY ARRAYS + an
    * in-row lookup — the ENRICHMENT form. Each user's click history
    * collapses into one sorted array row; a purchase then resolves its
    * at-or-before click with a pure in-row filter + tail pick (ANSI-
    * safe size-indexed element_at), so after the single equi-join
    * there is no window, no union, no custom operator — and the plan
    * is STREAM-COMPOSABLE: with a streaming purchase side this is a
    * stateless stream-static equi-join
    * ([[graft.streaming.StreamingOps.asofEnrichStream]]), the only
    * as-of form Structured Streaming runs without a state store.
    *
    * Contract: right-side per-key histories must fit a row (rates
    * tables, slowly-changing dims, per-user histories — the
    * enrichment cases); for fact-fact as-of use join_asof /
    * AsofJoinExec. Ties at equal click ts resolve to the max click_id
    * (the sorted array's tail), deterministic by construction.
    */
  def asofLookupOn(purchases: DataFrame, clicks: DataFrame): DataFrame = {
    val hist = clicks
      .groupBy("user_id")
      .agg(sort_array(collect_list(struct(col("ts"), col("click_id")))).as("hist"))
    purchases
      .join(hist, Seq("user_id"), "left")
      .withColumn("pref",
        filter(col("hist"), h => h.getField("ts") <= col("ts")))
      .withColumn("m",
        when(size(col("pref")) > 0, element_at(col("pref"), size(col("pref")))))
      .select(
        col("purchase_id"),
        col("user_id"),
        expr(s"ts DIV $NanosPerSec").as("purchase_s"),
        col("m.click_id").as("click_id"),
        expr(s"(ts - m.ts) DIV $NanosPerSec").as("gap_s"))
  }

  /** Registered batch form of [[asofLookupOn]] over the events split —
    * the same relation as join_asof through the lookup plan, under the
    * identical oracle text (one SQL, three execution paths).
    */
  def joinAsofLookup(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    asofLookupOn(
      ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id").as("purchase_id")),
      ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id")))
  }

  /** CDC changelog compaction (SCD1 latest-wins merge): the events
    * stream read as a change log keyed by user — `error` rows are
    * DELETE tombstones, everything else an upsert carrying `value` —
    * materialized into the current snapshot. This is the MERGE/
    * compaction step every CDC-fed lakehouse table needs: per key,
    * the latest change by (ts, event_id) wins; a winning tombstone
    * removes the key from the snapshot entirely.
    *
    * Scale design: ONE hash shuffle on the key + a per-key window
    * (identical asymptotics to the sort-merge compaction Hudi/Delta
    * run); no join, no global sort. The count/first aggregates ride
    * the same shuffle. At 100 TB the changelog partitions by key and
    * each key's history sorts locally — the canonical log-compaction
    * plan.
    */
  def cdcMerge(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"), col("value"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n_changes", count(lit(1)).over(Window.partitionBy("user_id")))
      .filter(col("rn") === 1 && col("event_type") =!= "error")
      .select(
        col("user_id"),
        col("event_id").as("last_event_id"),
        col("event_type").as("last_type"),
        col("value").as("last_value"),
        expr(s"ts DIV $NanosPerSec").as("last_s"),
        col("n_changes"))
  }

  /** Multi-touch LINEAR attribution: each purchase's value is split
    * equally across that user's clicks in the preceding hour
    * (last-touch is [[joinAsof]]; this is the other standard
    * attribution model). Per click: total credited revenue and the
    * number of purchases it participated in.
    *
    * Scale design: the qualifying (click, purchase) pairs come from
    * the SAME time-bucketed candidate equi-join as [[joinRange]]
    * (purchase replicated into 2 buckets, exact band predicate last —
    * candidates ∝ true matches, no inequality join operator); the
    * per-purchase fan-out count rides a window on the pair stream and
    * the per-click rollup is one partial-agg'd groupBy. Each value/k
    * term is floor-quantized to int64 micros BEFORE the per-click sum
    * (the [[attributionPosition]] term_q convention) so the aggregate
    * is an exact integer sum, merge-order free; the credit reads out
    * at 1e-4 (lm_score precedent).
    */
  def attributionLinear(s: SparkSession, d: String): DataFrame = {
    val WindowNs = 3600L * NanosPerSec
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("cts"),
        expr(s"ts DIV $WindowNs").as("bucket"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("value"),
        col("ts").as("pts"),
        explode(array(expr(s"ts DIV $WindowNs") - 1, expr(s"ts DIV $WindowNs")))
          .as("bucket"))
    val pairs = clicks.join(purchases, Seq("user_id", "bucket"))
      .filter(col("pts") >= col("cts") && col("pts") - col("cts") <= WindowNs)
      .select(col("user_id"), col("click_id"), col("purchase_id"), col("value"))
    pairs
      .withColumn("k", count(lit(1)).over(Window.partitionBy("purchase_id")))
      .withColumn("term_q",
        floor(col("value") / col("k") * 1e6 + lit(0.5)).cast("long"))
      .groupBy("click_id", "user_id")
      .agg(count(lit(1)).as("n_purchases"),
        (floor(sum(col("term_q")) / lit(100.0) + lit(0.5)) / 1e4).as("credit"))
  }

  /** TIME-DECAY multi-touch attribution — the fourth industry model
    * next to [[attributionLinear]] (equal), [[attributionPosition]]
    * (U-shaped), and the Markov/Shapley pair: within the 1-hour
    * lookback a click's weight halves every 15 minutes before the
    * purchase (2^-⌊Δt/15min⌋ — the discretized exponential decay ad
    * platforms ship), and each purchase's value (cents) splits
    * proportionally.
    *
    * Determinism: weights are 1e6 >> k (k ≤ 4 — exact integers,
    * 1e6 is divisible by 64), the per-purchase weight sum is an
    * integer window aggregate, and each credit term is one integer
    * (v·w·1e6) DIV Σw — so the per-click sum is merge-order free.
    * Same banded pair producer as the siblings: bucketed equi-join,
    * never an inequality join over raw event pairs.
    */
  def attributionDecay(s: SparkSession, d: String): DataFrame = {
    val WindowNs = 3600L * NanosPerSec
    val HalfLifeNs = 900L * NanosPerSec
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("cts"),
        expr(s"ts DIV $WindowNs").as("bucket"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("v"),
        col("ts").as("pts"),
        explode(array(expr(s"ts DIV $WindowNs") - 1, expr(s"ts DIV $WindowNs")))
          .as("bucket"))
    clicks.join(purchases, Seq("user_id", "bucket"))
      .filter(col("pts") >= col("cts") && col("pts") - col("cts") <= WindowNs)
      .select(col("user_id"), col("click_id"), col("purchase_id"), col("v"),
        expr(s"shiftright(1000000L, CAST((pts - cts) DIV $HalfLifeNs AS INT))")
          .as("w"))
      .withColumn("sw", sum(col("w")).over(Window.partitionBy("purchase_id")))
      .groupBy("click_id", "user_id")
      .agg(count(lit(1)).as("n_purchases"),
        sum(expr("(v * w * 1000000) DIV sw")).as("credit_microcents"))
  }

  /** Position-based (U-shaped) multi-touch attribution: within each
    * purchase's 1-hour lookback, the FIRST and LAST click earn 40%
    * each and the middles split the remaining 20% — the industry
    * counterpart to [[attributionLinear]]'s equal split (k=1 → 100%,
    * k=2 → 50/50). Same banded pair producer (bucketed equi-join,
    * never an inequality join over raw event pairs); the touch rank
    * is a per-purchase window with a click-id tie-break.
    *
    * Determinism: each touch's credit term is floor-quantized to
    * int64 micros BEFORE the per-click sum (weights like 0.2/(k-2)
    * are not dyadic, so a raw double sum would be merge-order
    * sensitive), making the aggregate an exact integer sum.
    */
  def attributionPosition(s: SparkSession, d: String): DataFrame = {
    val WindowNs = 3600L * NanosPerSec
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("cts"),
        expr(s"ts DIV $WindowNs").as("bucket"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("value"),
        col("ts").as("pts"),
        explode(array(expr(s"ts DIV $WindowNs") - 1, expr(s"ts DIV $WindowNs")))
          .as("bucket"))
    val pairs = clicks.join(purchases, Seq("user_id", "bucket"))
      .filter(col("pts") >= col("cts") && col("pts") - col("cts") <= WindowNs)
      .select(col("user_id"), col("click_id"), col("cts"),
        col("purchase_id"), col("value"))
    val byPurchase = Window.partitionBy("purchase_id")
    val rankW = byPurchase.orderBy(col("cts").asc, col("click_id").asc)
    val w = pairs
      .withColumn("k", count(lit(1)).over(byPurchase))
      .withColumn("rn", row_number().over(rankW))
      .withColumn("wgt",
        when(col("k") === 1, lit(1.0))
          .when(col("rn") === 1 || col("rn") === col("k"),
            when(col("k") === 2, lit(0.5)).otherwise(lit(0.4)))
          .otherwise(lit(0.2) / (col("k") - 2)))
      .withColumn("term_q",
        floor(col("wgt") * col("value") * 1e6 + lit(0.5)).cast("long"))
    w.groupBy("click_id", "user_id")
      .agg(count(lit(1)).as("n_purchases"),
        (floor(sum(col("term_q")) / lit(100.0) + lit(0.5)) / 1e4).as("credit"))
  }

  /** The STREAMING CDC-compaction code path executed on batch rows —
    * puts [[graft.streaming.StreamingOps.cdcCompactStream]] under the
    * driver's DuckDB oracle gate (same contract as the
    * events_*_stream twins): in batch execution each key's group is
    * processed once, so the stateful latest-wins fold produces
    * exactly [[cdcMerge]]'s snapshot; tombstone winners are filtered
    * here as the batch operator's WHERE does.
    */
  def cdcMergeStream(s: SparkSession, d: String): DataFrame = {
    val sess = s
    import sess.implicits._
    val changes = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"), col("value"))
      .as[(Long, Long, Long, String, Double)]
    graft.streaming.StreamingOps.cdcCompactStream(changes)
      .toDF()
      .filter(col("last_type") =!= "error")
  }

  /** GDPR erasure MANIFEST: for every key whose changelog ends in a
    * tombstone ([[cdcMerge]]'s delete semantics), the row counts and
    * time range of the history a right-to-be-forgotten job must purge
    * across derived tables. One window pass finds the tombstoned
    * keys; the manifest aggregation rides a semi-join on those keys —
    * at 100 TB the tombstone set is tiny and broadcast, and the purge
    * job consumes this manifest rather than rescanning.
    */
  def privacyErase(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"), col("value"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    val tomb = ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("event_type") === "error")
      .select(col("user_id"))
    ev.join(broadcast(tomb), "user_id")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_purchases"),
        expr(s"min(ts) DIV $NanosPerSec").as("first_s"),
        expr(s"max(ts) DIV $NanosPerSec").as("last_s"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "privacy_erase" -> privacyErase,
    "attribution_linear" -> attributionLinear,
    "attribution_position" -> attributionPosition,
    "attribution_decay" -> attributionDecay,
    "cdc_merge" -> cdcMerge,
    "cdc_merge_stream" -> cdcMergeStream,
    "join_asof" -> joinAsof,
    "join_asof_exec" -> joinAsofExec,
    "join_asof_fwd" -> joinAsofFwd,
    "join_asof_tol" -> joinAsofTol,
    "join_asof_nearest" -> joinAsofNearest,
    "join_asof_lookup" -> joinAsofLookup,
    "join_band_exec" -> joinBandExec,
    "join_range" -> joinRange)

  /** Band half-width for [[joinBandExec]]: ±10 minutes in nanos. */
  private val BandNanos = 600L * NanosPerSec

  /** Error-click correlation through the CUSTOM BAND-JOIN physical
    * operator (plans/BandJoin): for every error event, ALL clicks by
    * the same user within ±10 minutes — the event-correlation sweep
    * that a declarative `key = key AND ts BETWEEN …` turns into a
    * BNLJ. SMJ-shaped exchanges+sorts, one sliding-buffer merge pass
    * per partition; offsets stay in exact nanos.
    */
  def joinBandExec(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("err_id"),
        col("ts").as("ets"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("cts"))
    graft.plans.BandJoin.band(errors, clicks,
        "user_id", "c_user", "ets", "cts", BandNanos, BandNanos)
      .select(col("err_id"), col("user_id"), col("click_id"),
        (col("cts") - col("ets")).as("offset_ns"))
  }

  def oracleSql: Map[String, String] =
    oracleBase +
      ("join_asof_lookup" -> oracleBase("join_asof")) +
      ("join_band_exec" ->
        """SELECT e.event_id AS err_id, e.user_id, c.event_id AS click_id,
          |  epoch_ns(CAST(c.ts AS TIMESTAMP))
          |    - epoch_ns(CAST(e.ts AS TIMESTAMP)) AS offset_ns
          |FROM events e JOIN events c
          |  ON c.user_id = e.user_id
          | AND c.event_type = 'click' AND e.event_type = 'error'
          | AND epoch_ns(CAST(c.ts AS TIMESTAMP))
          |     BETWEEN epoch_ns(CAST(e.ts AS TIMESTAMP)) - 600000000000
          |         AND epoch_ns(CAST(e.ts AS TIMESTAMP)) + 600000000000""".stripMargin) +
      ("cdc_merge" ->
        """WITH ranked AS (
          |  SELECT user_id, ts, event_id, event_type, value,
          |    row_number() OVER (PARTITION BY user_id
          |      ORDER BY ts DESC, event_id DESC) AS rn,
          |    count(*) OVER (PARTITION BY user_id) AS n_changes
          |  FROM events)
          |SELECT user_id,
          |  event_id AS last_event_id,
          |  event_type AS last_type,
          |  value AS last_value,
          |  CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS last_s,
          |  n_changes
          |FROM ranked
          |WHERE rn = 1 AND event_type <> 'error'""".stripMargin) +
      ("cdc_merge_stream" ->
        """WITH ranked AS (
          |  SELECT user_id, ts, event_id, event_type, value,
          |    row_number() OVER (PARTITION BY user_id
          |      ORDER BY ts DESC, event_id DESC) AS rn,
          |    count(*) OVER (PARTITION BY user_id) AS n_changes
          |  FROM events)
          |SELECT user_id,
          |  event_id AS last_event_id,
          |  event_type AS last_type,
          |  value AS last_value,
          |  CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS last_s,
          |  n_changes
          |FROM ranked
          |WHERE rn = 1 AND event_type <> 'error'""".stripMargin) +
      ("privacy_erase" ->
        """WITH tomb AS (
          |  SELECT user_id FROM (
          |    SELECT user_id, event_type,
          |      row_number() OVER (PARTITION BY user_id
          |        ORDER BY ts DESC, event_id DESC) AS rn
          |    FROM events) WHERE rn = 1 AND event_type = 'error')
          |SELECT e.user_id, count(*) AS n_events,
          |  CAST(sum(CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END)
          |    AS BIGINT) AS n_purchases,
          |  CAST(floor(epoch(CAST(min(e.ts) AS TIMESTAMP))) AS BIGINT)
          |    AS first_s,
          |  CAST(floor(epoch(CAST(max(e.ts) AS TIMESTAMP))) AS BIGINT)
          |    AS last_s
          |FROM events e JOIN tomb USING (user_id)
          |GROUP BY e.user_id""".stripMargin) +
      ("attribution_position" ->
        """WITH pairs AS (
          |  SELECT c.user_id, c.event_id AS click_id, c.ts AS cts,
          |         p.event_id AS purchase_id, p.value
          |  FROM events c JOIN events p
          |    ON c.user_id = p.user_id
          |   AND c.event_type = 'click' AND p.event_type = 'purchase'
          |   AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR),
          |ranked AS (
          |  SELECT *,
          |    count(*) OVER (PARTITION BY purchase_id) AS k,
          |    row_number() OVER (PARTITION BY purchase_id
          |                       ORDER BY cts, click_id) AS rn
          |  FROM pairs),
          |weighted AS (
          |  SELECT click_id, user_id,
          |    CAST(floor((CASE
          |      WHEN k = 1 THEN 1.0
          |      WHEN rn = 1 OR rn = k THEN CASE WHEN k = 2 THEN 0.5 ELSE 0.4 END
          |      ELSE 0.2 / (k - 2) END) * value * 1e6 + 0.5) AS BIGINT) AS term_q
          |  FROM ranked)
          |SELECT click_id, user_id, count(*) AS n_purchases,
          |  floor(sum(term_q) / 100.0 + 0.5) / 1e4 AS credit
          |FROM weighted GROUP BY click_id, user_id""".stripMargin) +
      ("attribution_decay" ->
        """WITH pairs AS (
          |  SELECT c.user_id, c.event_id AS click_id,
          |         p.event_id AS purchase_id,
          |         CAST(floor(p.value * 100 + 0.5) AS BIGINT) AS v,
          |         1000000 // (1 << CAST((epoch_us(p.ts) - epoch_us(c.ts))
          |                               // 900000000 AS INTEGER)) AS w
          |  FROM events c JOIN events p
          |    ON c.user_id = p.user_id
          |   AND c.event_type = 'click' AND p.event_type = 'purchase'
          |   AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR),
          |k AS (SELECT *, CAST(sum(w) OVER (PARTITION BY purchase_id)
          |        AS BIGINT) AS sw FROM pairs)
          |SELECT click_id, user_id, count(*) AS n_purchases,
          |  CAST(sum((v * w * 1000000) // sw) AS BIGINT) AS credit_microcents
          |FROM k GROUP BY click_id, user_id""".stripMargin) +
      ("attribution_linear" ->
        """WITH pairs AS (
          |  SELECT c.user_id, c.event_id AS click_id,
          |         p.event_id AS purchase_id, p.value
          |  FROM events c JOIN events p
          |    ON c.user_id = p.user_id
          |   AND c.event_type = 'click' AND p.event_type = 'purchase'
          |   AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR),
          |k AS (SELECT *, count(*) OVER (PARTITION BY purchase_id) AS k
          |      FROM pairs),
          |weighted AS (
          |  SELECT click_id, user_id,
          |    CAST(floor(value / k * 1e6 + 0.5) AS BIGINT) AS term_q
          |  FROM k)
          |SELECT click_id, user_id,
          |  count(*) AS n_purchases,
          |  floor(sum(term_q) / 100.0 + 0.5) / 1e4 AS credit
          |FROM weighted GROUP BY click_id, user_id""".stripMargin)

  private val oracleBase: Map[String, String] = Map(
    // Same union + carry-forward formulation so semantics (incl. the
    // at-equal-ts ordering) match by construction.
    "join_asof" ->
      """WITH u AS (
        |  SELECT user_id, ts, event_id, 0 AS side FROM events WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT user_id, ts, event_id, 1 AS side FROM events WHERE event_type = 'purchase'),
        |w AS (
        |  SELECT *,
        |    last_value(CASE WHEN side = 0 THEN event_id END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, side
        |            ROWS UNBOUNDED PRECEDING) AS asof_click,
        |    last_value(CASE WHEN side = 0 THEN ts END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, side
        |            ROWS UNBOUNDED PRECEDING) AS asof_ts
        |  FROM u)
        |SELECT event_id AS purchase_id, user_id,
        |  CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS purchase_s,
        |  asof_click AS click_id,
        |  CAST(floor(epoch(ts - asof_ts)) AS BIGINT) AS gap_s
        |FROM w WHERE side = 1""".stripMargin,
    // the custom physical operator computes the same relation — one
    // oracle text, two execution paths under the gate
    "join_asof_exec" ->
      """WITH u AS (
        |  SELECT user_id, ts, event_id, 0 AS side FROM events WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT user_id, ts, event_id, 1 AS side FROM events WHERE event_type = 'purchase'),
        |w AS (
        |  SELECT *,
        |    last_value(CASE WHEN side = 0 THEN event_id END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, side
        |            ROWS UNBOUNDED PRECEDING) AS asof_click,
        |    last_value(CASE WHEN side = 0 THEN ts END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, side
        |            ROWS UNBOUNDED PRECEDING) AS asof_ts
        |  FROM u)
        |SELECT event_id AS purchase_id, user_id,
        |  CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS purchase_s,
        |  asof_click AS click_id,
        |  CAST(floor(epoch(ts - asof_ts)) AS BIGINT) AS gap_s
        |FROM w WHERE side = 1""".stripMargin,
    // nearest direction: both carry walks over one sorted pass, then
    // the smaller absolute gap wins (tie → backward), mirroring
    // joinAsofNearest's window pair and (ts, side, event_id) order.
    "join_asof_nearest" ->
      """WITH u AS (
        |  SELECT user_id, ts, event_id, 0 AS side FROM events WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT user_id, ts, event_id, 1 AS side FROM events WHERE event_type = 'purchase'),
        |w AS (
        |  SELECT *,
        |    last_value(CASE WHEN side = 0 THEN event_id END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, side, event_id
        |            ROWS UNBOUNDED PRECEDING) AS bid,
        |    last_value(CASE WHEN side = 0 THEN ts END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, side, event_id
        |            ROWS UNBOUNDED PRECEDING) AS bts,
        |    first_value(CASE WHEN side = 0 THEN event_id END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, side, event_id
        |            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS fid,
        |    first_value(CASE WHEN side = 0 THEN ts END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, side, event_id
        |            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS fts
        |  FROM u)
        |SELECT event_id AS purchase_id, user_id,
        |  CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS purchase_s,
        |  CASE WHEN bts IS NOT NULL AND (fts IS NULL OR ts - bts <= fts - ts)
        |       THEN bid ELSE fid END AS click_id,
        |  CAST(floor(epoch(
        |    CASE WHEN bts IS NOT NULL AND (fts IS NULL OR ts - bts <= fts - ts)
        |         THEN ts - bts ELSE fts - ts END)) AS BIGINT) AS gap_s,
        |  CASE WHEN bts IS NOT NULL AND (fts IS NULL OR ts - bts <= fts - ts)
        |         THEN 'back'
        |       WHEN fts IS NOT NULL THEN 'fwd' END AS dir
        |FROM w WHERE side = 1""".stripMargin,
    // forward direction: walk the timeline DESC carrying the last-seen
    // purchase — in descending order that is the EARLIEST purchase at
    // or after each click (equal ts: purchase first via side asc).
    "join_asof_fwd" ->
      """WITH u AS (
        |  SELECT user_id, ts, event_id, 0 AS side FROM events WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT user_id, ts, event_id, 1 AS side FROM events WHERE event_type = 'click'),
        |w AS (
        |  SELECT *,
        |    last_value(CASE WHEN side = 0 THEN event_id END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts DESC, side
        |            ROWS UNBOUNDED PRECEDING) AS next_purchase,
        |    last_value(CASE WHEN side = 0 THEN ts END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts DESC, side
        |            ROWS UNBOUNDED PRECEDING) AS next_ts
        |  FROM u)
        |SELECT event_id AS click_id, user_id,
        |  CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS click_s,
        |  next_purchase AS purchase_id,
        |  CAST(floor(epoch(next_ts - ts)) AS BIGINT) AS delay_s
        |FROM w WHERE side = 1""".stripMargin,
    // tolerance: the carry-forward candidate is nulled when older than
    // 1 h. epoch_ns keeps the boundary compare in exact integer
    // nanoseconds — the same `pts - cts <= 3600e9` the operator does —
    // so no interval/µs truncation can flip a boundary pair.
    "join_asof_tol" ->
      """WITH u AS (
        |  SELECT user_id, ts, event_id, 0 AS side FROM events WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT user_id, ts, event_id, 1 AS side FROM events WHERE event_type = 'purchase'),
        |w AS (
        |  SELECT *,
        |    last_value(CASE WHEN side = 0 THEN event_id END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, side
        |            ROWS UNBOUNDED PRECEDING) AS asof_click,
        |    last_value(CASE WHEN side = 0 THEN ts END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, side
        |            ROWS UNBOUNDED PRECEDING) AS asof_ts
        |  FROM u)
        |SELECT event_id AS purchase_id, user_id,
        |  CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS purchase_s,
        |  CASE WHEN asof_ts IS NOT NULL
        |        AND epoch_ns(ts) - epoch_ns(asof_ts) <= 3600000000000
        |       THEN asof_click END AS click_id,
        |  CASE WHEN asof_ts IS NOT NULL
        |        AND epoch_ns(ts) - epoch_ns(asof_ts) <= 3600000000000
        |       THEN CAST(floor(epoch(ts - asof_ts)) AS BIGINT) END AS gap_s
        |FROM w WHERE side = 1""".stripMargin,
    "join_range" ->
      """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
        |  CAST(floor(epoch(p.ts - c.ts)) AS BIGINT) AS gap_s
        |FROM events c JOIN events p
        |  ON c.user_id = p.user_id
        | AND c.event_type = 'click' AND p.event_type = 'purchase'
        | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 10 MINUTE""".stripMargin)
}
