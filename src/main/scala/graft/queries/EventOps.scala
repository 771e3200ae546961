package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Time-window analytics over the `events` table in BATCH mode — the
  * same `window()`/`session_window()` operators Structured Streaming
  * uses (graft.streaming.StreamingOps runs the readStream versions;
  * these batch forms are the DuckDB-oracle-checkable twins).
  *
  * ts arrives as epoch-nanos long (see Tables.events); wall-clock
  * columns derive via integer division (`ts DIV 1000` → µs), and
  * results emit epoch SECONDS as BIGINT — never raw timestamps — so
  * ns-vs-µs precision can't skew the comparison.
  */
object EventOps {

  private def withTsm(df: DataFrame): DataFrame =
    df.withColumn("tsm", timestamp_micros(expr("ts DIV 1000")))

  /** Tumbling 1-hour windows × event_type. */
  def eventsTumbling(s: SparkSession, d: String): DataFrame =
    withTsm(Tables.events(s, d))
      .groupBy(window(col("tsm"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_val"))
      .select(col("window.start").cast("long").as("wstart"), col("event_type"),
        col("n"), col("sum_val"))

  /** The STREAMING tumbling transform executed on batch rows — puts
    * graft.streaming.StreamingOps under the driver's DuckDB oracle
    * gate. The exact code path a readStream query runs (watermark
    * included; the optimizer's EliminateEventTimeWatermark erases it
    * on a batch child, which is precisely the stream≡batch contract
    * StreamingSpec asserts micro-batch-wise).
    */
  def eventsTumblingStream(s: SparkSession, d: String): DataFrame =
    graft.streaming.StreamingOps.tumblingCounts(withTsm(Tables.events(s, d)))

  /** StreamingOps.slidingCounts on batch rows — same oracle contract
    * as [[eventsTumblingStream]], for the sliding-window operator.
    */
  def eventsSlidingStream(s: SparkSession, d: String): DataFrame =
    graft.streaming.StreamingOps.slidingCounts(withTsm(Tables.events(s, d)))

  /** StreamingOps.sessionCounts on batch rows — the session_window
    * merge logic under the DuckDB gaps-and-islands oracle.
    */
  def eventsSessionStream(s: SparkSession, d: String): DataFrame =
    graft.streaming.StreamingOps.sessionCounts(withTsm(Tables.events(s, d)))

  /** Sliding 1-hour windows every 15 minutes (each event in 4 windows). */
  def eventsSliding(s: SparkSession, d: String): DataFrame =
    withTsm(Tables.events(s, d))
      .groupBy(window(col("tsm"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_val"))
      .select(col("window.start").cast("long").as("wstart"), col("n"), col("sum_val"))

  /** Session windows per user with a 30-minute inactivity gap — the
    * native session operator (merge-able session state in streaming;
    * here the batch twin). Oracle = classic gaps-and-islands SQL.
    */
  def eventsSession(s: SparkSession, d: String): DataFrame =
    withTsm(Tables.events(s, d))
      .groupBy(session_window(col("tsm"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_val"))
      .select(col("user_id"), col("session_window.start").cast("long").as("sstart"),
        col("n"), col("sum_val"))

  /** Ordered funnel: first view → first click at-or-after it → first
    * purchase at-or-after that, per user; one summary row with stage
    * reach and the mean view→purchase gap. Each stage is an early
    * event_type filter + hash agg on user_id + equi-join against the
    * (already aggregated, one-row-per-user) previous stage — linear,
    * key-partitioned, no inequality join over raw event pairs.
    */
  def eventsFunnel(s: SparkSession, d: String): DataFrame = {
    val NanosPerSec = 1000000000L
    val ev = Tables.events(s, d).select(col("user_id"), col("event_type"), col("ts"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("vts"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("ts") >= col("vts"))
      .groupBy("user_id").agg(min("ts").as("cts"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("ts") >= col("cts"))
      .groupBy("user_id").agg(min("ts").as("pts"))
    val gaps = p.join(v, "user_id")
      .agg(count(lit(1)).as("n_purchased"),
        round(avg(expr(s"(pts - vts) DIV $NanosPerSec")), 2).as("avg_gap_s"))
    v.agg(count(lit(1)).as("n_viewed"))
      .crossJoin(c.agg(count(lit(1)).as("n_clicked")))
      .crossJoin(gaps)
      .select("n_viewed", "n_clicked", "n_purchased", "avg_gap_s")
  }

  /** Cohort retention: users grouped by first-active day; for each
    * (cohort_day, day_offset) the count of cohort users active that
    * day. Plan shape for scale: the per-user-day `distinct` runs
    * FIRST, collapsing raw event volume to |users|×|days| in the one
    * and only pass over the raw table; the cohort day then comes from
    * a min() window over that collapsed table rather than a self-join
    * (a join-shaped cohort re-scans the raw events for the build side
    * — twice the scan cost for the same answer).
    */
  def eventsRetention(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ud = Tables.events(s, d)
      .select(col("user_id"), expr("ts DIV 1000000000 DIV 86400").as("day"))
      .distinct()
    ud.withColumn("cohort_day", min("day").over(Window.partitionBy("user_id")))
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(countDistinct("user_id").as("n_users"))
  }

  /** Trailing-window z-score anomaly detection over per-hour event
    * volumes — the monitoring query an ingest pipeline alerts on. Each
    * hour is scored against the 24 PRIOR hourly rows (excluding
    * itself — the alert baseline is history, which is also what makes
    * the streaming twin StreamingOps.anomalyAlerts exactly equivalent
    * on ordered input); explicit sum/sumsq so both engines run the
    * identical arithmetic (the stats_agg convention); hours with
    * |z| >= 2 and a defined sd are flagged. Counts collapse map-side
    * to (type, hour) cells before any window, so the sort is over the
    * tiny hourly series, never raw events.
    */
  def eventsAnomaly(s: SparkSession, d: String): DataFrame =
    eventsAnomalyOn(Tables.events(s, d)
      .select(col("event_type"), expr("ts DIV 3600000000000").as("hour"))
      .groupBy("event_type", "hour")
      .agg(count(lit(1)).as("c")))

  /** Core of [[eventsAnomaly]] over a pre-aggregated hourly
    * (event_type, hour, c) frame — also the batch twin the streaming
    * spec compares StreamingOps.anomalyAlerts against.
    */
  def eventsAnomalyOn(hourly: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("hour").rowsBetween(-24, -1)
    hourly
      .select(col("event_type"), col("hour"), col("c"),
        count(lit(1)).over(w).as("n"),
        sum("c").over(w).as("s"),
        sum(col("c") * col("c")).over(w).as("ss"))
      .filter(col("n") >= 2)
      .select(col("event_type"), col("hour"), col("c"),
        ((col("ss") - col("s").cast("double") * col("s") / col("n")) / (col("n") - 1)).as("v"),
        (col("s").cast("double") / col("n")).as("mean"))
      .filter(col("v") > 0)
      .filter(abs((col("c") - col("mean")) / sqrt(col("v"))) >= 2.0)
      .select(col("event_type"), col("hour"), col("c"),
        round(col("mean"), 4).as("mean24"),
        round((col("c") - col("mean")) / sqrt(col("v")), 4).as("z"))
  }

  /** EWMA smoothing depth (trailing observations) and decay. */
  val EwmaWindow = 24
  val EwmaAlpha = 0.2

  /** (1−α)^k weights, computed ONCE here and embedded as literals in
    * BOTH the Spark plan and the oracle SQL (Double.toString round-trips
    * exactly), so neither engine's pow() is in the comparison path.
    * private[graft]: StreamingOps.ewmaStream folds the SAME values in
    * the same order, making stream ≡ batch bit-exact.
    */
  private[graft] val ewmaWeights: IndexedSeq[Double] =
    (0 until EwmaWindow).map(k => math.pow(1.0 - EwmaAlpha, k.toDouble))

  /** Exponentially-weighted moving average of the hourly event-type
    * series — the smoothing/forecast primitive next to
    * [[eventsAnomaly]]'s z-score detector. Finite-memory form
    * (trailing EwmaWindow OBSERVATIONS, missing-hour-skipping like the
    * anomaly window), weights renormalized over the present terms so
    * series heads are unbiased:
    * s_t = Σ_k (1−α)^k·x_{t−k} / Σ_k (1−α)^k.
    *
    * Scale: one hourly pre-aggregation (map-side partial), then one
    * window pass per event_type — the smoothing itself is a
    * fixed-width lag chain inside a single window spec, no self-join,
    * no recursion. Cross-engine determinism: the lag chain is summed
    * left-associated in both engines with shared weight literals, then
    * floor-rounded at 1e-4 (the half-point-safe convention).
    */
  def eventsEwma(s: SparkSession, d: String): DataFrame =
    eventsEwmaOn(Tables.events(s, d)
      .select(col("event_type"), expr("ts DIV 3600000000000").as("hour"))
      .groupBy("event_type", "hour")
      .agg(count(lit(1)).as("c")))

  /** Core of [[eventsEwma]] over a pre-aggregated hourly
    * (event_type, hour, c) frame — also the batch twin the streaming
    * spec compares StreamingOps.ewmaStream against.
    */
  def eventsEwmaOn(hourly: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("hour")
    val terms = (0 until EwmaWindow).map { k =>
      val l = if (k == 0) col("c").cast("double")
              else lag(col("c"), k).over(w).cast("double")
      (when(l.isNotNull, l * lit(ewmaWeights(k))).otherwise(lit(0.0)),
        when(l.isNotNull, lit(ewmaWeights(k))).otherwise(lit(0.0)))
    }
    val num = terms.map(_._1).reduce(_ + _) // left-assoc, mirrors the SQL
    val den = terms.map(_._2).reduce(_ + _)
    hourly.select(col("event_type"), col("hour"), col("c"),
      (floor(num / den * lit(1e4) + lit(0.5)) / lit(1e4)).as("ewma"))
  }

  /** SCD2 (slowly-changing-dimension type 2) HISTORY BUILD: fold a
    * change stream into versioned dimension rows with validity
    * intervals — the standard warehouse/feature-store operator for
    * "what was this user's tier at time t" point-in-time joins (the
    * training-serving-skew guard). Change feed = each user's purchase
    * events; tracked attribute = spend tier (floor(value/50)).
    * Consecutive equal tiers collapse (gaps-and-islands change
    * detection via lag); each surviving change opens a version row
    * `[effective_from, effective_to]` closed by the next change's
    * start − 1, with the open row flagged `is_current`.
    *
    * Scale design: ONE hash shuffle on user_id + two frame-bounded
    * window walks over per-user sorted runs — identical envelope to
    * [[Temporal.joinAsof]]; no self-join, no driver state. The
    * (ts, event_id) sort key pins same-second change order so both
    * engines fold identical sequences.
    */
  /** The surviving tier-change rows (user_id, ts_s, event_id, tier) —
    * the version-open stream [[scd2History]] closes into intervals and
    * [[joinPit]] carries forward.
    */
  private[graft] def scd2Changes(s: SparkSession, d: String): DataFrame = {
    val NanosPerSec = 1000000000L
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts_s"), col("event_id"))
    Tables.events(s, d).filter(col("event_type") === "purchase")
      .select(col("user_id"), expr(s"ts DIV $NanosPerSec").as("ts_s"),
        col("event_id"), floor(col("value") / 50).cast("int").as("tier"))
      .withColumn("prev_tier", lag("tier", 1).over(w))
      .filter(col("prev_tier").isNull || col("tier") =!= col("prev_tier"))
      .select("user_id", "ts_s", "event_id", "tier")
  }

  def scd2History(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts_s"), col("event_id"))
    scd2Changes(s, d)
      .withColumn("effective_to", lead(col("ts_s"), 1).over(w) - 1)
      .select(col("user_id"), col("tier"), col("ts_s").as("effective_from"),
        col("effective_to"),
        col("effective_to").isNull.cast("int").as("is_current"))
  }

  /** POINT-IN-TIME JOIN: each view event enriched with the SCD2 tier
    * that was valid AT ITS TIMESTAMP — the feature-store lookup that
    * guards against training-serving skew (training must see the
    * feature value as of the event, never a later one; a plain
    * dimension join silently leaks the future). Views before a user's
    * first version keep NULL.
    *
    * Scale design: the naive form is an interval join (inequality,
    * nested-loop at scale). This is the carry-forward union instead —
    * tag version-opens side 0 and views side 1, ONE hash shuffle on
    * user_id, one sorted walk carrying the latest tier ([[Temporal
    * .joinAsof]]'s idiom; the version stream needs no interval closing
    * at all). The spec proves equivalence to the explicit interval
    * join against [[scd2History]].
    */
  def joinPit(s: SparkSession, d: String): DataFrame = {
    val NanosPerSec = 1000000000L
    val versions = scd2Changes(s, d).withColumn("side", lit(0))
    val views = Tables.events(s, d).filter(col("event_type") === "view")
      .select(col("user_id"), expr(s"ts DIV $NanosPerSec").as("ts_s"),
        col("event_id"), lit(null).cast("int").as("tier"), lit(1).as("side"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts_s"), col("side"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    versions.unionByName(views)
      .withColumn("cur",
        last(when(col("side") === 0, col("tier")), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id"), col("user_id"), col("ts_s").as("event_s"),
        col("cur").as("tier"))
  }

  /** In-row PIT lookup — the STREAM-COMPOSABLE execution path of
    * [[joinPit]] ([[Temporal.asofLookupOn]]'s idiom applied to SCD2):
    * each user's version changes collapse into ONE sorted array row;
    * a view then resolves its as-of tier with a pure in-row filter +
    * tail pick after a single equi-join. With a streaming view side
    * this is a stateless stream-static join (StreamingOps
    * .pitEnrichStream) — no state store, no watermark, and a version
    * refresh re-plans into the next micro-batch. Contract: per-user
    * version history fits a row (SCD2 histories are change-compressed
    * by construction). `views` needs (user_id, s, event_id).
    */
  def pitLookupOn(views: DataFrame, changes: DataFrame): DataFrame = {
    val hist = changes.groupBy("user_id")
      .agg(sort_array(collect_list(
        struct(col("ts_s"), col("event_id"), col("tier")))).as("h"))
    views.join(hist, Seq("user_id"), "left")
      .withColumn("cand", filter(col("h"), v => v("ts_s") <= col("s")))
      .withColumn("m",
        when(size(col("cand")) > 0, element_at(col("cand"), size(col("cand")))))
      .select(col("event_id"), col("user_id"), col("s").as("event_s"),
        col("m")("tier").as("tier"))
  }

  /** Registered batch form of [[pitLookupOn]] — the same relation as
    * [[joinPit]] through the in-row lookup plan, under the identical
    * oracle text (one SQL, two execution paths — the join_asof_lookup
    * convention).
    */
  def joinPitLookup(s: SparkSession, d: String): DataFrame = {
    val NanosPerSec = 1000000000L
    val views = Tables.events(s, d).filter(col("event_type") === "view")
      .select(col("user_id"), expr(s"ts DIV $NanosPerSec").as("s"), col("event_id"))
    pitLookupOn(views, scd2Changes(s, d))
  }

  /** Per-event ROLLING FEATURE FRAME — the feature-engineering pass a
    * behavioral model trains on, computed with the three window-frame
    * families over one per-user sort: gap to the previous event
    * (lag), mean value over the 5 preceding events (ROWS frame — tie
    * order pinned by event_id so the frame is deterministic), and
    * event count in the trailing hour INCLUDING self (RANGE frame
    * over the numeric event time). ONE hash shuffle on user_id; all
    * three windows share the same sort.
    */
  def featureRolling(s: SparkSession, d: String): DataFrame = {
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val rows5 = byUser.rowsBetween(-5, -1)
    val range1h = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"))
      .rangeBetween(-3600L * 1000000000L, 0)
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .select(
        col("event_id"), col("user_id"),
        expr("(ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) DIV 1000000000")
          .as("prev_gap_s"),
        (floor(avg(col("value")).over(rows5) * 10000 + 0.5) / 10000.0).as("avg5"),
        count(lit(1)).over(range1h).as("cnt_1h"))
  }

  /** LOCF imputation (last observation carried forward): `error`
    * events are treated as missing readings and backfilled from the
    * user's most recent non-error value — the standard time-series
    * imputation pass before feature extraction. One per-user window
    * over one hash shuffle; a key with no prior observation stays
    * NULL (no cross-user leakage). The carried value is copied, not
    * computed, so the gate is exact.
    */
  def imputeLocf(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        when(col("event_type") =!= "error", col("value")).as("v_obs"))
      .select(col("event_id"), col("user_id"),
        last(col("v_obs"), ignoreNulls = true).over(w).as("value_filled"),
        col("v_obs").isNull.cast("int").as("imputed"))
  }

  /** Robust anomaly profile per event_type: median + MAD (median
    * absolute deviation) and the count of events outside
    * median ± 3σ̂ where σ̂ = 1.4826·MAD — the outlier rule that, unlike
    * events_anomaly's mean/stddev z-score, is itself immune to the
    * outliers it hunts. Exact interpolated percentiles (Spark
    * `percentile` ≡ DuckDB `quantile_cont`, the skew_diagnose
    * precedent); two value-stream aggregation passes with the tiny
    * per-type stats broadcast back.
    */
  def anomalyMad(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("event_type"), col("value"))
    val med = ev.groupBy("event_type")
      .agg(expr("percentile(value, 0.5)").as("med"))
    val stats = ev.join(broadcast(med), "event_type")
      .groupBy("event_type")
      .agg(max("med").as("med"),
        expr("percentile(abs(value - med), 0.5)").as("mad"))
    ev.join(broadcast(stats), "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(when(abs(col("value") - col("med")) > lit(4.4478) * col("mad"), 1L)
          .otherwise(0L)).as("n_anomalies"),
        (floor(max("med") * 10000 + 0.5) / 10000.0).as("med"),
        (floor(max("mad") * 10000 + 0.5) / 10000.0).as("mad"))
  }

  /** OHLC candlesticks per (hour, event_type): open/high/low/close of
    * `value` plus count and volume — the ordered first/last aggregate
    * the time-series rollup family needs. Open/close resolve by
    * lexicographic `min/max(struct(ts, event_id, value))` — a pure
    * hash aggregate (ONE shuffle, no window, no sort), deterministic
    * because event_id breaks ts ties; high/low/count ride the same
    * shuffle. The volume sum rounds half-up at 1e-4.
    */
  def eventsOhlc(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(expr("ts DIV 3600000000000").as("hour"), col("event_type"),
        col("ts"), col("event_id"), col("value"))
      .groupBy("hour", "event_type")
      .agg(
        min(struct(col("ts"), col("event_id"), col("value"))).as("o"),
        max(struct(col("ts"), col("event_id"), col("value"))).as("c"),
        max("value").as("high"), min("value").as("low"),
        count(lit(1)).as("n"),
        (floor(sum("value") * 10000 + 0.5) / 10000.0).as("volume"))
      .select(col("hour"), col("event_type"),
        col("o.value").as("open"), col("high"), col("low"),
        col("c.value").as("close"), col("n"), col("volume"))

  /** SEASONALLY-ADJUSTED anomaly profile: values are deseasonalized
    * against their (event_type, hour-of-day) baseline mean before the
    * 3σ gate — the upgrade over events_anomaly's flat z-score that
    * stops a nightly traffic trough from masking (or faking)
    * outliers. Residual spread is per event_type. Two
    * group-cardinality aggregation passes + broadcast joins back;
    * the value stream shuffles once per pass on tiny keys.
    */
  def anomalySeasonal(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_type"),
        expr("(ts DIV 3600000000000) % 24").as("hod"), col("value"))
    val profile = ev.groupBy("event_type", "hod")
      .agg(avg("value").as("mu"))
    val resid = ev.join(broadcast(profile), Seq("event_type", "hod"))
      .select(col("event_type"), (col("value") - col("mu")).as("r"))
    val spread = resid.groupBy("event_type")
      .agg(stddev_samp("r").as("sd"))
    resid.join(broadcast(spread), "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(when(abs(col("r")) > lit(3.0) * col("sd"), 1L).otherwise(0L))
          .as("n_anomalies"),
        (floor(max("sd") * 10000 + 0.5) / 10000.0).as("sd_resid"))
  }

  /** The STREAMING LOCF code path on batch rows — puts
    * [[graft.streaming.StreamingOps.imputeLocfStream]] under the same
    * DuckDB oracle as [[imputeLocf]] (the events_*_stream contract):
    * in batch execution each key's full history folds once in
    * (ts, event_id) order, which is exactly the window's carry.
    */
  def imputeLocfStreamBatch(s: SparkSession, d: String): DataFrame = {
    val sess = s
    import sess.implicits._
    graft.streaming.StreamingOps.imputeLocfStream(
      Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"), col("value"))
        .as[(Long, Long, Long, String, Double)])
      .toDF()
  }

  /** RFM user segmentation — the classic behavioral feature vector:
    * per purchasing user, Recency (hours from last purchase to the
    * corpus horizon = global max event ts), Frequency (purchase
    * count), Monetary (summed purchase value), plus the monetary
    * quartile via per-user ntile. One purchase-side aggregation
    * shuffle; the 1-row horizon frame broadcasts; the quartile window
    * runs on the user-cardinality aggregate (users ≪ events — the
    * frame a segmentation job materializes anyway).
    */
  def userRfm(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val horizon = ev.agg(max("ts").as("now"))
    val rfm = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(max("ts").as("last_ts"), count(lit(1)).as("frequency"),
        (floor(sum("value") * 100 + 0.5) / 100.0).as("monetary"))
      .crossJoin(broadcast(horizon))
      .select(col("user_id"),
        expr("(now - last_ts) DIV 3600000000000").as("recency_h"),
        col("frequency"), col("monetary"))
    // monetary quartiles over ALL purchasing users — |users| scales
    // with the corpus, so the total order is a range-partitioned
    // ScalableRank row number + closed-form NTILE, never an
    // unpartitioned ntile window
    val rfmS = { import graft.core.Checkpoints.StableOps; rfm.stable }
    val nF = rfmS.agg(count(lit(1)).as("n_total"))
    graft.core.ScalableRank
      .rowNumber(rfmS, "rn", col("monetary").desc, col("user_id").asc)
      .crossJoin(broadcast(nF)) // 1-row count attachment
      .withColumn("m_quartile",
        graft.core.ScalableRank.ntileExpr("rn", "n_total", 4).cast("int"))
      .select(col("user_id"), col("recency_h"), col("frequency"),
        col("monetary"), col("m_quartile"))
  }

  /** Markov JOURNEY analysis: the user-path transition matrix —
    * counts and probabilities of each (previous event_type → next
    * event_type) step along every user's time-ordered stream, the
    * first artifact a funnel/attribution review builds. One per-user
    * window (lag) + one tiny (type × type) aggregate; probabilities
    * are exact integer ratios rounded half-up at 1e-4.
    */
  def journeyTransitions(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val steps = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .filter(col("prev_type").isNotNull)
    // aggregate FIRST (type × type cells), then row-normalize over the
    // tiny cell frame — a window partitioned by prev_type on the raw
    // stream would funnel everything into |types| partitions (skew)
    val cnt = steps.groupBy("prev_type", "event_type")
      .agg(count(lit(1)).as("n"))
    val from = cnt.groupBy("prev_type").agg(sum("n").as("n_from"))
    cnt.join(broadcast(from), "prev_type")
      .select(col("prev_type"), col("event_type"), col("n"),
        (floor(col("n").cast("double") / col("n_from") * 10000 + 0.5)
          / 10000.0).as("p"))
  }

  /** Next-event prediction BACKTEST for the Markov journey model —
    * the eval harness [[journeyTransitions]] feeds: train the
    * argmax-next-type table on the first three weeks (days <
    * [[MarkovSplitDay]] — the testdata contract pins January 2024),
    * predict the most frequent successor per current type (count
    * DESC, type ASC tie-break), score on the held-out tail. Output
    * per current type: the model's prediction, test transitions,
    * hits, and micro accuracy — all integer counts and one DIV.
    *
    * Scale shape: two (types × types)-cell aggregates off one
    * lag-window pass; the argmax and scoring run on the tiny cell
    * frames.
    */
  val MarkovSplitDay = 19744L // 2024-01-22 (data starts 2024-01-01)

  def markovEval(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val steps = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        expr("ts DIV 86400000000000").as("day"))
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .filter(col("prev_type").isNotNull)
    val train = steps.filter(col("day") < MarkovSplitDay)
      .groupBy("prev_type", "event_type").agg(count(lit(1)).as("n"))
    val wArg = org.apache.spark.sql.expressions.Window
      .partitionBy("prev_type").orderBy(col("n").desc, col("event_type").asc)
    val pred = train.withColumn("rk", row_number().over(wArg))
      .filter(col("rk") === 1)
      .select(col("prev_type"), col("event_type").as("pred_type"))
    steps.filter(col("day") >= MarkovSplitDay)
      .groupBy("prev_type", "event_type").agg(count(lit(1)).as("m"))
      .join(broadcast(pred), "prev_type")
      .groupBy("prev_type", "pred_type")
      .agg(sum("m").as("n_test"),
        sum(when(col("event_type") === col("pred_type"), col("m"))
          .otherwise(0L)).as("n_correct"))
      .withColumn("acc_micro", expr("(n_correct * 1000000) DIV n_test"))
  }

  /** Seasonal-naive forecast BACKTEST: predict the final day's hourly
    * event counts per type from the prior days' hour-of-day means and
    * report the mean absolute error — the baseline every real
    * forecasting pipeline must beat, and the backtest harness shape
    * (train strictly before the horizon) that proves no leakage.
    * Everything aggregates to (type × day × hour) cells first; the
    * horizon is a broadcast 1-row frame.
    */
  def forecastBaseline(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_type"),
        expr("ts DIV 86400000000000").as("day"),
        expr("(ts DIV 3600000000000) % 24").as("hod"))
    val horizon = ev.agg(max("day").as("last_day"))
    val cells = ev.groupBy("event_type", "day", "hod")
      .agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(horizon))
    val train = cells.filter(col("day") < col("last_day"))
      .groupBy("event_type", "hod")
      .agg(sum("n").as("total"), countDistinct("day").as("n_days"))
    val test = cells.filter(col("day") === col("last_day"))
      .select(col("event_type"), col("hod"), col("n"))
    test.join(train, Seq("event_type", "hod"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_hours"),
        (floor(avg(abs(col("n").cast("double")
          - col("total").cast("double") / col("n_days"))) * 10000 + 0.5)
          / 10000.0).as("mae"))
  }

  /** Frequent 3-step JOURNEY PATHS: the top-10 (a → b → c) event-type
    * sequences across user streams with support counts — the
    * sequence-mining companion to [[journeyTransitions]]'s one-step
    * matrix (a funnel hypothesis generator). Two lags over one
    * per-user sort, then a (type³)-cardinality count; top-k by
    * (support desc, path) is deterministic.
    */
  def journeyPaths(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("t1", lag("event_type", 2).over(w))
      .withColumn("t2", lag("event_type", 1).over(w))
      .filter(col("t1").isNotNull)
      .groupBy(col("t1"), col("t2"), col("event_type").as("t3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("t1"), col("t2"), col("t3"))
      .limit(10)
  }

  /** Week-over-week TREND per event_type: weekly event counts with
    * the previous week's count and the percent change — the
    * monitoring rollup a growth dashboard reads. Cell-aggregate
    * first; the lag window runs on the (type × week) frame. Weeks
    * are epoch-week buckets (day DIV 7), so the first/last partial
    * weeks are honest partials.
    */
  def trendWow(s: SparkSession, d: String): DataFrame = {
    val weekly = Tables.events(s, d)
      .select(col("event_type"), expr("ts DIV 604800000000000").as("week"))
      .groupBy("event_type", "week").agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("week")
    weekly
      .withColumn("prev_n", lag("n", 1).over(w))
      .select(col("event_type"), col("week"), col("n"), col("prev_n"),
        when(col("prev_n").isNotNull,
          floor((col("n") - col("prev_n")).cast("double") / col("prev_n")
            * 1000000 + 0.5) / 10000.0).as("pct_change"))
  }

  /** Winsorized z-score FEATURE SCALING per event_type: values clamp
    * to the exact [p5, p95] band, then standardize by the clamped
    * slice's mean/stddev — the robust preprocessing every behavioral
    * model runs so a single whale doesn't dominate the gradient. Two
    * type-cardinality stats passes broadcast back over one scan
    * lineage; flags mark clamped rows.
    */
  def featureScale(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("event_type"), col("value"))
    val bands = ev.groupBy("event_type")
      .agg(expr("percentile(value, 0.05)").as("p5"),
        expr("percentile(value, 0.95)").as("p95"))
    val clamped = ev.join(broadcast(bands), "event_type")
      .select(col("event_id"), col("event_type"),
        least(greatest(col("value"), col("p5")), col("p95")).as("v"),
        (col("value") < col("p5") || col("value") > col("p95"))
          .cast("int").as("clipped"))
    val stats = clamped.groupBy("event_type")
      .agg(avg("v").as("mu"), stddev_samp("v").as("sd"))
    clamped.join(broadcast(stats), "event_type")
      .select(col("event_id"), col("event_type"),
        (floor((col("v") - col("mu")) / col("sd") * 10000 + 0.5) / 10000.0)
          .as("scaled"),
        col("clipped"))
  }

  /** A/B experiment readout: deterministic arm assignment (user_id
    * parity — the hash-bucket split every experimentation platform
    * uses), per-arm value metrics from POWER SUMS (n, Σx, Σx²), lift
    * and a Welch z-statistic. Power sums, not builtin stddev: both
    * engines then run the identical closed formula over the identical
    * sums (the Advanced.stats_agg determinism rule). One aggregation
    * pass over events; the two 1-row arm frames join into the single
    * readout row — O(1) everywhere after the scan.
    */
  def abTestReadout(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select((col("user_id") % 2).as("arm"), col("value"))
    val sums = ev.groupBy("arm")
      .agg(count(lit(1)).as("n"), sum("value").as("s"),
        sum(col("value") * col("value")).as("ss"))
    val a = sums.filter(col("arm") === 0)
      .select(col("n").as("n_a"), col("s").as("s_a"), col("ss").as("ss_a"))
    val b = sums.filter(col("arm") === 1)
      .select(col("n").as("n_b"), col("s").as("s_b"), col("ss").as("ss_b"))
    val mA = col("s_a") / col("n_a")
    val mB = col("s_b") / col("n_b")
    val vA = (col("ss_a") - col("s_a") * col("s_a") / col("n_a")) / (col("n_a") - 1)
    val vB = (col("ss_b") - col("s_b") * col("s_b") / col("n_b")) / (col("n_b") - 1)
    val z = (mB - mA) / sqrt(vA / col("n_a") + vB / col("n_b"))
    a.crossJoin(broadcast(b))
      .select(col("n_a"), col("n_b"),
        (floor(mA * 10000 + 0.5) / 10000.0).as("mean_a"),
        (floor(mB * 10000 + 0.5) / 10000.0).as("mean_b"),
        (floor((mB - mA) / mA * 1000000 + 0.5) / 10000.0).as("lift_pct"),
        (floor(z * 10000 + 0.5) / 10000.0).as("z_score"))
  }

  /** The STREAMING left-outer interval join executed on batch rows —
    * the events_*_stream oracle contract for
    * [[graft.streaming.StreamingOps.streamStreamJoinOuter]]: views
    * left-joined to their 5-minute click window; view rows with no
    * in-window click survive with NULL click columns (exactly the
    * rows the streaming query emits on watermark expiry). On batch
    * children the watermark erases and the equi-key (user_id) keeps
    * the plan a shuffled join with a range residual — never a BNLJ.
    */
  def eventsJoinOuterStream(s: SparkSession, d: String): DataFrame = {
    val ev = withTsm(Tables.events(s, d))
      .select(col("tsm"), col("user_id"), col("event_type"), col("value"))
    graft.streaming.StreamingOps.streamStreamJoinOuter(
      ev.filter(col("event_type") === "view"),
      ev.filter(col("event_type") === "click"))
  }

  /** Two-sample Kolmogorov-Smirnov drift statistic between the value
    * distributions of two event populations (views vs purchases) —
    * the distribution-free counterpart to the binned drift_psi: KS is
    * sensitive anywhere on the CDF, needs no bin design, and is the
    * standard "did this metric's distribution shift" gate.
    *
    * D = max_v |F̂_a(v) − F̂_b(v)| evaluated at the pooled distinct
    * values: per-value counts (one hash agg), a range-partitioned
    * two-column prefix sum over the value order (ScalableRank — no
    * single-partition window), a max. Everything after the agg is
    * \|distinct values\|-sized. The empirical CDFs are exact-integer
    * ratios, so the max and its argmin location are cross-engine
    * deterministic; the statistic floor-quantizes at 6dp.
    */
  def driftKs(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("value"), (col("event_type") === "view").as("is_a"))
    val perValue = ev.groupBy("value")
      .agg(sum(when(col("is_a"), 1L).otherwise(0L)).as("a_n"),
        sum(when(!col("is_a"), 1L).otherwise(0L)).as("b_n"))
    val totals = perValue.agg(sum("a_n").as("tot_a"), sum("b_n").as("tot_b"))
    // distinct values grow with the corpus: both CDFs come from ONE
    // range-partitioned two-column prefix sum, not a global window
    val diffs = graft.core.ScalableRank
      .prefixSums(perValue, Seq("a_n", "b_n"), Seq("cum_a", "cum_b"),
        col("value").asc)
      .crossJoin(broadcast(totals))
      .withColumn("d_q", floor(abs(
        col("cum_a").cast("double") / col("tot_a") -
          col("cum_b").cast("double") / col("tot_b")) * 1e6 + lit(0.5)).cast("long"))
    val mx = diffs.agg(max("d_q").as("ks_q"))
    diffs.crossJoin(broadcast(mx))
      .filter(col("d_q") === col("ks_q"))
      .groupBy(col("tot_a"), col("tot_b"), col("ks_q"))
      .agg(min("value").as("ks_at"))
      .select(col("tot_a").as("n_a"), col("tot_b").as("n_b"),
        (col("ks_q") / 1e6).as("ks_stat"), col("ks_at"))
  }

  /** Row-pattern matching (the MATCH_RECOGNIZE shape): detect strict
    * view→click→purchase CONSECUTIVE triples inside each user's
    * time-ordered stream, completing within 48 hours of the first
    * step (the stream's inter-event spacing is ~6 h, so a 1-hour
    * bound matches nothing at any SF). Unlike events_funnel (first-per-stage, gaps allowed), this
    * is the adjacency pattern — two lead() windows per user, no join,
    * one shuffle on user_id; span bound applied on the epoch-second
    * timeline.
    */
  def patternMatch(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val NanosPerSec = 1000000000L
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("t1", lead("event_type", 1).over(w))
      .withColumn("t2", lead("event_type", 2).over(w))
      .withColumn("id1", lead("event_id", 1).over(w))
      .withColumn("id2", lead("event_id", 2).over(w))
      .withColumn("ts2", lead("ts", 2).over(w))
      .filter(col("event_type") === "view" && col("t1") === "click" &&
        col("t2") === "purchase" &&
        col("ts2") - col("ts") <= lit(48L * 3600L) * NanosPerSec)
      .select(col("user_id"), col("event_id").as("view_id"),
        col("id1").as("click_id"), col("id2").as("purchase_id"),
        expr(s"(ts2 - ts) DIV $NanosPerSec").as("span_s"))
  }

  /** Concurrency profile via a SWEEP LINE over session intervals: how
    * many user sessions are simultaneously active at every change
    * point (capacity planning's core question). Sessions come from
    * the same 30-min-gap sessionization as events_session; each emits
    * a +1 at its start and a −1 at its end, and a running sum over
    * the totally-ordered event points (ts, +1-before-−1, user) yields
    * the active count after each change. Output is change-point rows
    * (2·\|sessions\|, corpus-sublinear — but still growing with the
    * corpus, so the running sum is a range-partitioned prefix sum
    * over the point order, never a single-partition window).
    */
  def concurrencyProfile(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val NanosPerSec = 1000000000L
    val uw = Window.partitionBy("user_id").orderBy("ts")
    val sess = Tables.events(s, d)
      .select(col("user_id"), col("ts"))
      .withColumn("brk",
        when(lag("ts", 1).over(uw).isNull ||
          col("ts") - lag("ts", 1).over(uw) >= lit(1800L) * NanosPerSec, 1)
          .otherwise(0))
      .withColumn("sid", sum("brk").over(uw.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "sid")
      .agg(min("ts").as("sstart"), max("ts").as("send"))
    val points = sess.select(col("user_id"), col("sstart").as("pts"), lit(1).as("delta"))
      .unionAll(sess.select(col("user_id"), col("send").as("pts"), lit(-1).as("delta")))
      .withColumn("dl", col("delta").cast("long"))
    graft.core.ScalableRank
      .prefixSum(points, "dl", "n_active",
        col("pts").asc, col("delta").desc, col("user_id").asc)
      .select(expr(s"pts DIV $NanosPerSec").as("ts_s"), col("delta"),
        col("user_id"), col("n_active"))
  }

  /** Conversion-latency quartiles: per converting user, the gap from
    * FIRST view to the FIRST purchase at-or-after it, summarized as
    * exact p25/p50/p75. Quartile interpolation on integer seconds is
    * dyadic-exact ((n−1)·q lands on quarters; x+(y−x)·f with integer
    * endpoints and f ∈ {0,¼,½,¾} is exact IEEE), so the exact
    * percentile — normally a cross-engine hash risk — is
    * deterministic here by construction. Two per-user aggregates and
    * a 1-row summary; no raw event pair join.
    */
  def funnelLatency(s: SparkSession, d: String): DataFrame = {
    val NanosPerSec = 1000000000L
    val ev = Tables.events(s, d)
    val firstView = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("vts"))
    val gaps = ev.filter(col("event_type") === "purchase")
      .join(firstView, "user_id")
      .filter(col("ts") >= col("vts"))
      .groupBy("user_id").agg(min("ts").as("pts"), first("vts").as("vts"))
      .select(expr(s"(pts - vts) DIV $NanosPerSec").as("gap_s"))
    gaps.agg(count(lit(1)).as("n_converted"),
      expr("percentile(gap_s, 0.25)").as("p25_s"),
      expr("percentile(gap_s, 0.5)").as("p50_s"),
      expr("percentile(gap_s, 0.75)").as("p75_s"))
  }

  /** Cohort LTV curves: users cohorted by first-event week, purchase
    * value accumulated by cohort age in weeks — the
    * customer-lifetime-value matrix every growth team plots. Values
    * int64-cent quantized before the sums (exact running
    * accumulation); weeks are integer epoch-week buckets. Aggregates
    * collapse to \|cohorts × ages\| rows before the cumulative
    * window.
    */
  def cohortLtv(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val WeekNs = 7L * 86400L * 1000000000L
    val ev = Tables.events(s, d)
    val cohort = ev.groupBy("user_id")
      .agg(expr(s"min(ts) DIV $WeekNs").as("cohort_week"))
    val cells = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), expr(s"ts DIV $WeekNs").as("week"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("cents"))
      .join(cohort, "user_id")
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("age_week"))
      .agg(sum("cents").as("week_cents"))
    val sizes = cohort.groupBy("cohort_week").agg(count(lit(1)).as("n_users"))
    val cum = Window.partitionBy("cohort_week").orderBy("age_week")
      .rowsBetween(Window.unboundedPreceding, 0)
    cells
      .withColumn("cum_cents", sum("week_cents").over(cum))
      .join(sizes, "cohort_week")
      .select(col("cohort_week"), col("age_week"), col("n_users"),
        round(col("cum_cents") / lit(100.0), 2).as("cum_value"))
  }

  /** Per-user behavioral entropy: Shannon entropy (nats) of each
    * user's event-type distribution — low entropy = single-behavior
    * users (bots, scrapers), high = diverse engagement; the anomaly
    * feature behind bot heuristics. Terms −pᵢ·ln(pᵢ) are int64-
    * quantized at 1e-9 before summing (order-independent aggregate;
    * the 4dp output floor sits far above any cross-engine ln ulp).
    * Two hash aggs: (user, type) cells then per-user fold.
    */
  def journeyEntropy(s: SparkSession, d: String): DataFrame = {
    val cells = Tables.events(s, d)
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
    val byUser = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
    cells
      .withColumn("n", sum("c").over(byUser))
      .withColumn("p", col("c").cast("double") / col("n"))
      .withColumn("term_q",
        floor(-col("p") * log(col("p")) * 1e9 + lit(0.5)).cast("long"))
      .groupBy("user_id")
      .agg(first("n").as("n_events"),
        (floor(sum("term_q") / lit(1e5) + lit(0.5)) / 1e4).as("entropy_nats"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "journey_entropy" -> journeyEntropy,
    "funnel_latency" -> funnelLatency,
    "cohort_ltv" -> cohortLtv,
    "concurrency_profile" -> concurrencyProfile,
    "pattern_match" -> patternMatch,
    "drift_ks" -> driftKs,
    "events_join_outer_stream" -> eventsJoinOuterStream,
    "ab_test_readout" -> abTestReadout,
    "feature_scale" -> featureScale,
    "journey_paths" -> journeyPaths,
    "trend_wow" -> trendWow,
    "forecast_baseline" -> forecastBaseline,
    "journey_transitions" -> journeyTransitions,
    "markov_eval" -> markovEval,
    "user_rfm" -> userRfm,
    "impute_locf_stream" -> imputeLocfStreamBatch,
    "anomaly_seasonal" -> anomalySeasonal,
    "events_ohlc" -> eventsOhlc,
    "impute_locf" -> imputeLocf,
    "anomaly_mad" -> anomalyMad,
    "feature_rolling" -> featureRolling,
    "scd2_history" -> scd2History,
    "join_pit" -> joinPit,
    "join_pit_lookup" -> joinPitLookup,
    "events_ewma" -> eventsEwma,
    "events_anomaly" -> eventsAnomaly,
    "events_retention" -> eventsRetention,
    "events_tumbling" -> eventsTumbling,
    "events_tumbling_stream" -> eventsTumblingStream,
    "events_sliding_stream" -> eventsSlidingStream,
    "events_session_stream" -> eventsSessionStream,
    "events_sliding" -> eventsSliding,
    "events_session" -> eventsSession,
    "events_funnel" -> eventsFunnel)

  // ONE oracle text for both LOCF execution paths (window twin and
  // stateful-fold twin) — the two can never drift apart.
  private val imputeLocfSql =
    """SELECT event_id, user_id,
      |  last_value(CASE WHEN event_type <> 'error' THEN value END
      |    IGNORE NULLS) OVER (PARTITION BY user_id
      |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
      |    AS value_filled,
      |  CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS imputed
      |FROM events""".stripMargin

  def oracleSql: Map[String, String] =
    oracleBase +
      ("journey_entropy" ->
        """WITH cells AS (
          |  SELECT user_id, event_type, count(*) AS c
          |  FROM events GROUP BY 1, 2),
          |wn AS (
          |  SELECT user_id, c,
          |    sum(c) OVER (PARTITION BY user_id) AS n
          |  FROM cells),
          |terms AS (
          |  SELECT user_id, n,
          |    CAST(floor(-(CAST(c AS DOUBLE) / n)
          |      * ln(CAST(c AS DOUBLE) / n) * 1e9 + 0.5) AS BIGINT) AS term_q
          |  FROM wn)
          |SELECT user_id, CAST(min(n) AS BIGINT) AS n_events,
          |  floor(sum(term_q) / 1e5 + 0.5) / 1e4 AS entropy_nats
          |FROM terms GROUP BY user_id""".stripMargin) +
      ("funnel_latency" ->
        """WITH fv AS (
          |  SELECT user_id, min(ts) AS vts FROM events
          |  WHERE event_type = 'view' GROUP BY 1),
          |conv AS (
          |  SELECT e.user_id,
          |    CAST(floor(epoch(min(e.ts) - min(fv.vts))) AS BIGINT) AS gap_s
          |  FROM events e JOIN fv ON e.user_id = fv.user_id
          |  WHERE e.event_type = 'purchase' AND e.ts >= fv.vts
          |  GROUP BY e.user_id)
          |SELECT count(*) AS n_converted,
          |  quantile_cont(gap_s, 0.25) AS p25_s,
          |  quantile_cont(gap_s, 0.5) AS p50_s,
          |  quantile_cont(gap_s, 0.75) AS p75_s
          |FROM conv""".stripMargin) +
      ("cohort_ltv" ->
        """WITH cohort AS (
          |  SELECT user_id,
          |    CAST(floor(epoch(min(ts))) AS BIGINT) // (7 * 86400) AS cohort_week
          |  FROM events GROUP BY 1),
          |cells AS (
          |  SELECT c.cohort_week,
          |    CAST(floor(epoch(e.ts)) AS BIGINT) // (7 * 86400) - c.cohort_week
          |      AS age_week,
          |    CAST(sum(CAST(floor(e.value * 100 + 0.5) AS BIGINT)) AS BIGINT)
          |      AS week_cents
          |  FROM events e JOIN cohort c USING (user_id)
          |  WHERE e.event_type = 'purchase'
          |  GROUP BY 1, 2),
          |sizes AS (SELECT cohort_week, count(*) AS n_users
          |          FROM cohort GROUP BY 1)
          |SELECT cohort_week, age_week, n_users,
          |  round(sum(week_cents) OVER (PARTITION BY cohort_week
          |    ORDER BY age_week ROWS UNBOUNDED PRECEDING) / 100.0, 2)
          |    AS cum_value
          |FROM cells JOIN sizes USING (cohort_week)""".stripMargin) +
      ("concurrency_profile" ->
        """WITH x AS (
          |  SELECT user_id, ts,
          |    CASE WHEN lag(ts) OVER w IS NULL
          |              OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
          |         THEN 1 ELSE 0 END AS brk
          |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
          |y AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
          |        ROWS UNBOUNDED PRECEDING) AS sid FROM x),
          |sess AS (
          |  SELECT user_id, min(ts) AS sstart, max(ts) AS send
          |  FROM y GROUP BY user_id, sid),
          |points AS (
          |  SELECT user_id, sstart AS pts, 1 AS delta FROM sess
          |  UNION ALL
          |  SELECT user_id, send AS pts, -1 AS delta FROM sess)
          |SELECT CAST(floor(epoch(CAST(pts AS TIMESTAMP))) AS BIGINT) AS ts_s,
          |  delta, user_id,
          |  CAST(sum(delta) OVER (ORDER BY pts ASC, delta DESC, user_id ASC
          |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_active
          |FROM points""".stripMargin) +
      ("pattern_match" ->
        """WITH w AS (
          |  SELECT user_id, ts, event_id, event_type,
          |    lead(event_type, 1) OVER uw AS t1,
          |    lead(event_type, 2) OVER uw AS t2,
          |    lead(event_id, 1) OVER uw AS id1,
          |    lead(event_id, 2) OVER uw AS id2,
          |    lead(ts, 2) OVER uw AS ts2
          |  FROM events
          |  WINDOW uw AS (PARTITION BY user_id ORDER BY ts, event_id))
          |SELECT user_id, event_id AS view_id, id1 AS click_id,
          |  id2 AS purchase_id,
          |  CAST(floor(epoch(ts2 - ts)) AS BIGINT) AS span_s
          |FROM w
          |WHERE event_type = 'view' AND t1 = 'click' AND t2 = 'purchase'
          |  AND ts2 - ts <= INTERVAL 48 HOUR""".stripMargin) +
      ("drift_ks" ->
        """WITH pts AS (
          |  SELECT value, event_type = 'view' AS is_a FROM events
          |  WHERE event_type IN ('view', 'purchase')),
          |pv AS (
          |  SELECT value,
          |    CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS a_n,
          |    CAST(sum(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS BIGINT) AS b_n
          |  FROM pts GROUP BY value),
          |tot AS (SELECT CAST(sum(a_n) AS BIGINT) AS tot_a,
          |               CAST(sum(b_n) AS BIGINT) AS tot_b FROM pv),
          |cum AS (
          |  SELECT value,
          |    sum(a_n) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS cum_a,
          |    sum(b_n) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS cum_b
          |  FROM pv),
          |diffs AS (
          |  SELECT value,
          |    CAST(floor(abs(CAST(cum_a AS DOUBLE) / tot_a
          |      - CAST(cum_b AS DOUBLE) / tot_b) * 1e6 + 0.5) AS BIGINT) AS d_q
          |  FROM cum, tot),
          |mx AS (SELECT max(d_q) AS ks_q FROM diffs)
          |SELECT tot_a AS n_a, tot_b AS n_b, ks_q / 1e6 AS ks_stat,
          |  min(value) AS ks_at
          |FROM diffs, mx, tot WHERE d_q = ks_q
          |GROUP BY tot_a, tot_b, ks_q""".stripMargin) +
      ("events_join_outer_stream" ->
        """SELECT i.user_id,
          |  CAST(floor(epoch(CAST(i.ts AS TIMESTAMP))) AS BIGINT) AS imp_s,
          |  CAST(floor(epoch(CAST(c.ts AS TIMESTAMP))) AS BIGINT) AS click_s,
          |  c.value AS click_val
          |FROM events i
          |LEFT JOIN events c
          |  ON c.user_id = i.user_id AND c.event_type = 'click'
          | AND c.ts >= i.ts AND c.ts <= i.ts + INTERVAL 5 MINUTE
          |WHERE i.event_type = 'view'""".stripMargin) +
      ("ab_test_readout" ->
        """WITH sums AS (
          |  SELECT user_id % 2 AS arm, count(*) AS n,
          |    sum(value) AS s, sum(value * value) AS ss
          |  FROM events GROUP BY 1),
          |a AS (SELECT n AS n_a, s AS s_a, ss AS ss_a FROM sums WHERE arm = 0),
          |b AS (SELECT n AS n_b, s AS s_b, ss AS ss_b FROM sums WHERE arm = 1)
          |SELECT n_a, n_b,
          |  floor(s_a / n_a * 10000 + 0.5) / 10000.0 AS mean_a,
          |  floor(s_b / n_b * 10000 + 0.5) / 10000.0 AS mean_b,
          |  floor((s_b / n_b - s_a / n_a) / (s_a / n_a) * 1000000 + 0.5) / 10000.0
          |    AS lift_pct,
          |  floor((s_b / n_b - s_a / n_a)
          |    / sqrt(((ss_a - s_a * s_a / n_a) / (n_a - 1)) / n_a
          |         + ((ss_b - s_b * s_b / n_b) / (n_b - 1)) / n_b)
          |    * 10000 + 0.5) / 10000.0 AS z_score
          |FROM a, b""".stripMargin) +
      ("join_pit_lookup" -> oracleBase("join_pit")) +
      ("impute_locf_stream" -> imputeLocfSql) +
      ("feature_rolling" ->
        """SELECT event_id, user_id,
          |  CAST(floor(epoch(ts - lag(ts) OVER
          |    (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT)
          |    AS prev_gap_s,
          |  floor(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
          |    ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING) * 10000 + 0.5)
          |    / 10000.0 AS avg5,
          |  count(*) OVER (PARTITION BY user_id ORDER BY ts
          |    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
          |    AS cnt_1h
          |FROM events""".stripMargin) +
      ("impute_locf" -> imputeLocfSql) +
      ("anomaly_mad" ->
        """WITH med AS (
          |  SELECT event_type, quantile_cont(value, 0.5) AS med
          |  FROM events GROUP BY 1),
          |st AS (
          |  SELECT e.event_type, max(m.med) AS med,
          |    quantile_cont(abs(e.value - m.med), 0.5) AS mad
          |  FROM events e JOIN med m USING (event_type)
          |  GROUP BY e.event_type)
          |SELECT e.event_type, count(*) AS n_events,
          |  CAST(sum(CASE WHEN abs(e.value - s.med) > 4.4478 * s.mad
          |    THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
          |  floor(max(s.med) * 10000 + 0.5) / 10000.0 AS med,
          |  floor(max(s.mad) * 10000 + 0.5) / 10000.0 AS mad
          |FROM events e JOIN st s USING (event_type)
          |GROUP BY e.event_type""".stripMargin) +
      ("events_ohlc" ->
        """WITH r AS (
          |  SELECT CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 3600) AS BIGINT)
          |           AS hour,
          |    event_type, value,
          |    row_number() OVER (PARTITION BY
          |        CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 3600) AS BIGINT),
          |        event_type ORDER BY ts, event_id) AS rn_a,
          |    row_number() OVER (PARTITION BY
          |        CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 3600) AS BIGINT),
          |        event_type ORDER BY ts DESC, event_id DESC) AS rn_d
          |  FROM events)
          |SELECT hour, event_type,
          |  max(CASE WHEN rn_a = 1 THEN value END) AS open,
          |  max(value) AS high, min(value) AS low,
          |  max(CASE WHEN rn_d = 1 THEN value END) AS close,
          |  count(*) AS n,
          |  floor(sum(value) * 10000 + 0.5) / 10000.0 AS volume
          |FROM r GROUP BY hour, event_type""".stripMargin) +
      ("anomaly_seasonal" ->
        """WITH ev AS (
          |  SELECT event_type,
          |    CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 3600) AS BIGINT) % 24
          |      AS hod,
          |    value
          |  FROM events),
          |profile AS (SELECT event_type, hod, avg(value) AS mu
          |            FROM ev GROUP BY 1, 2),
          |resid AS (SELECT ev.event_type, ev.value - p.mu AS r
          |          FROM ev JOIN profile p USING (event_type, hod)),
          |spread AS (SELECT event_type, stddev_samp(r) AS sd
          |           FROM resid GROUP BY 1)
          |SELECT r.event_type, count(*) AS n_events,
          |  CAST(sum(CASE WHEN abs(r.r) > 3.0 * s.sd THEN 1 ELSE 0 END)
          |    AS BIGINT) AS n_anomalies,
          |  floor(max(s.sd) * 10000 + 0.5) / 10000.0 AS sd_resid
          |FROM resid r JOIN spread s USING (event_type)
          |GROUP BY r.event_type""".stripMargin) +
      ("user_rfm" ->
        """WITH h AS (SELECT max(ts) AS now FROM events),
          |rfm AS (
          |  SELECT user_id, max(ts) AS last_ts, count(*) AS frequency,
          |    floor(sum(value) * 100 + 0.5) / 100.0 AS monetary
          |  FROM events WHERE event_type = 'purchase'
          |  GROUP BY user_id)
          |SELECT user_id,
          |  CAST(floor(epoch(h.now - last_ts) / 3600) AS BIGINT) AS recency_h,
          |  frequency, monetary,
          |  CAST(ntile(4) OVER (ORDER BY monetary DESC, user_id) AS INTEGER)
          |    AS m_quartile
          |FROM rfm CROSS JOIN h""".stripMargin) +
      ("markov_eval" ->
        s"""WITH steps AS (
          |  SELECT lag(event_type, 1) OVER (PARTITION BY user_id
          |      ORDER BY ts, event_id) AS prev_type,
          |    event_type,
          |    CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT)
          |      AS day
          |  FROM events),
          |train AS (SELECT prev_type, event_type, count(*) AS n
          |          FROM steps
          |          WHERE prev_type IS NOT NULL AND day < $MarkovSplitDay
          |          GROUP BY 1, 2),
          |pred AS (
          |  SELECT prev_type, event_type AS pred_type FROM (
          |    SELECT prev_type, event_type,
          |      row_number() OVER (PARTITION BY prev_type
          |        ORDER BY n DESC, event_type ASC) AS rk
          |    FROM train) WHERE rk = 1),
          |test AS (SELECT prev_type, event_type, count(*) AS m
          |         FROM steps
          |         WHERE prev_type IS NOT NULL AND day >= $MarkovSplitDay
          |         GROUP BY 1, 2)
          |SELECT t.prev_type, p.pred_type,
          |  CAST(sum(m) AS BIGINT) AS n_test,
          |  CAST(sum(CASE WHEN t.event_type = p.pred_type THEN m ELSE 0 END)
          |    AS BIGINT) AS n_correct,
          |  CAST(sum(CASE WHEN t.event_type = p.pred_type THEN m ELSE 0 END)
          |    * 1000000 // sum(m) AS BIGINT) AS acc_micro
          |FROM test t JOIN pred p USING (prev_type)
          |GROUP BY 1, 2""".stripMargin) +
      ("journey_transitions" ->
        """WITH steps AS (
          |  SELECT lag(event_type, 1) OVER (PARTITION BY user_id
          |      ORDER BY ts, event_id) AS prev_type,
          |    event_type
          |  FROM events),
          |cnt AS (SELECT prev_type, event_type, count(*) AS n
          |        FROM steps WHERE prev_type IS NOT NULL
          |        GROUP BY 1, 2),
          |f AS (SELECT prev_type, CAST(sum(n) AS BIGINT) AS n_from
          |      FROM cnt GROUP BY 1)
          |SELECT c.prev_type, c.event_type, c.n,
          |  floor(CAST(c.n AS DOUBLE) / f.n_from * 10000 + 0.5) / 10000.0 AS p
          |FROM cnt c JOIN f USING (prev_type)""".stripMargin) +
      ("forecast_baseline" ->
        """WITH ev AS (
          |  SELECT event_type,
          |    CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT)
          |      AS day,
          |    CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 3600) AS BIGINT) % 24
          |      AS hod
          |  FROM events),
          |horizon AS (SELECT max(day) AS last_day FROM ev),
          |cells AS (SELECT event_type, day, hod, count(*) AS n
          |          FROM ev GROUP BY 1, 2, 3),
          |train AS (SELECT c.event_type, c.hod,
          |            CAST(sum(c.n) AS BIGINT) AS total,
          |            count(DISTINCT c.day) AS n_days
          |          FROM cells c CROSS JOIN horizon h
          |          WHERE c.day < h.last_day
          |          GROUP BY 1, 2),
          |test AS (SELECT c.event_type, c.hod, c.n
          |         FROM cells c CROSS JOIN horizon h
          |         WHERE c.day = h.last_day)
          |SELECT t.event_type,
          |  count(*) AS n_hours,
          |  floor(avg(abs(CAST(t.n AS DOUBLE)
          |    - CAST(tr.total AS DOUBLE) / tr.n_days)) * 10000 + 0.5)
          |    / 10000.0 AS mae
          |FROM test t JOIN train tr USING (event_type, hod)
          |GROUP BY t.event_type""".stripMargin) +
      ("feature_scale" ->
        """WITH bands AS (
          |  SELECT event_type,
          |    quantile_cont(value, 0.05) AS p5,
          |    quantile_cont(value, 0.95) AS p95
          |  FROM events GROUP BY 1),
          |clamped AS (
          |  SELECT e.event_id, e.event_type,
          |    least(greatest(e.value, b.p5), b.p95) AS v,
          |    CAST(CASE WHEN e.value < b.p5 OR e.value > b.p95
          |      THEN 1 ELSE 0 END AS INTEGER) AS clipped
          |  FROM events e JOIN bands b USING (event_type)),
          |stats AS (
          |  SELECT event_type, avg(v) AS mu, stddev_samp(v) AS sd
          |  FROM clamped GROUP BY 1)
          |SELECT c.event_id, c.event_type,
          |  floor((c.v - s.mu) / s.sd * 10000 + 0.5) / 10000.0 AS scaled,
          |  c.clipped
          |FROM clamped c JOIN stats s USING (event_type)""".stripMargin) +
      ("journey_paths" ->
        """WITH steps AS (
          |  SELECT lag(event_type, 2) OVER w AS t1,
          |    lag(event_type, 1) OVER w AS t2,
          |    event_type AS t3
          |  FROM events
          |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
          |SELECT t1, t2, t3, count(*) AS n
          |FROM steps WHERE t1 IS NOT NULL
          |GROUP BY 1, 2, 3
          |ORDER BY n DESC, t1, t2, t3
          |LIMIT 10""".stripMargin) +
      ("trend_wow" ->
        """WITH weekly AS (
          |  SELECT event_type,
          |    CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 604800) AS BIGINT)
          |      AS week,
          |    count(*) AS n
          |  FROM events GROUP BY 1, 2)
          |SELECT event_type, week, n,
          |  lag(n, 1) OVER (PARTITION BY event_type ORDER BY week) AS prev_n,
          |  CASE WHEN lag(n, 1) OVER (PARTITION BY event_type ORDER BY week)
          |         IS NOT NULL
          |    THEN floor(CAST(n - lag(n, 1) OVER (PARTITION BY event_type
          |           ORDER BY week) AS DOUBLE)
          |         / lag(n, 1) OVER (PARTITION BY event_type ORDER BY week)
          |         * 1000000 + 0.5) / 10000.0
          |  END AS pct_change
          |FROM weekly""".stripMargin)

  private val oracleBase: Map[String, String] = Map(
    "join_pit" ->
      """WITH pe AS (
        |  SELECT user_id,
        |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS ts_s,
        |    event_id, CAST(floor(value / 50) AS INTEGER) AS tier
        |  FROM events WHERE event_type = 'purchase'),
        |ch AS (
        |  SELECT user_id, ts_s, event_id, tier FROM (
        |    SELECT *, lag(tier) OVER (PARTITION BY user_id
        |      ORDER BY ts_s, event_id) AS prev_tier
        |    FROM pe)
        |  WHERE prev_tier IS NULL OR tier <> prev_tier),
        |u AS (
        |  SELECT user_id, ts_s, event_id, tier, 0 AS side FROM ch
        |  UNION ALL
        |  SELECT user_id,
        |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT),
        |    event_id, CAST(NULL AS INTEGER), 1
        |  FROM events WHERE event_type = 'view'),
        |w AS (
        |  SELECT *, last_value(CASE WHEN side = 0 THEN tier END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts_s, side, event_id
        |          ROWS UNBOUNDED PRECEDING) AS cur
        |  FROM u)
        |SELECT event_id, user_id, ts_s AS event_s, cur AS tier
        |FROM w WHERE side = 1""".stripMargin,
    "scd2_history" ->
      """WITH pe AS (
        |  SELECT user_id,
        |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS ts_s,
        |    event_id, CAST(floor(value / 50) AS INTEGER) AS tier
        |  FROM events WHERE event_type = 'purchase'),
        |ch AS (
        |  SELECT user_id, ts_s, event_id, tier FROM (
        |    SELECT *, lag(tier) OVER (PARTITION BY user_id
        |      ORDER BY ts_s, event_id) AS prev_tier
        |    FROM pe)
        |  WHERE prev_tier IS NULL OR tier <> prev_tier)
        |SELECT user_id, tier, ts_s AS effective_from,
        |  lead(ts_s) OVER w - 1 AS effective_to,
        |  CAST(CASE WHEN lead(ts_s) OVER w IS NULL THEN 1 ELSE 0 END
        |       AS INTEGER) AS is_current
        |FROM ch
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)""".stripMargin,
    "events_ewma" -> {
      val lags = (1 until EwmaWindow).map(k =>
        s"lag(c, $k) OVER tw AS l$k").mkString(",\n        |    ")
      // identical left-assoc chain + shared weight literals as eventsEwma
      val num = (s"CAST(c AS DOUBLE) * ${ewmaWeights(0)}" +:
        (1 until EwmaWindow).map(k =>
          s"CASE WHEN l$k IS NULL THEN 0.0 ELSE CAST(l$k AS DOUBLE) * ${ewmaWeights(k)} END"))
        .mkString(" + ")
      val den = (s"${ewmaWeights(0)}" +:
        (1 until EwmaWindow).map(k =>
          s"CASE WHEN l$k IS NULL THEN 0.0 ELSE ${ewmaWeights(k)} END"))
        .mkString(" + ")
      s"""WITH h AS (
        |  SELECT event_type,
        |    CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 3600) AS BIGINT) AS hour,
        |    count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |l AS (
        |  SELECT event_type, hour, c,
        |    $lags
        |  FROM h
        |  WINDOW tw AS (PARTITION BY event_type ORDER BY hour))
        |SELECT event_type, hour, c,
        |  floor(($num) / ($den) * 1e4 + 0.5) / 1e4 AS ewma
        |FROM l""".stripMargin
    },
    "events_anomaly" ->
      """WITH h AS (
        |  SELECT event_type,
        |    CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 3600) AS BIGINT) AS hour,
        |    count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT event_type, hour, c,
        |    count(*) OVER tw AS n,
        |    CAST(sum(c) OVER tw AS BIGINT) AS s,
        |    CAST(sum(c * c) OVER tw AS BIGINT) AS ss
        |  FROM h
        |  WINDOW tw AS (PARTITION BY event_type ORDER BY hour
        |                ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)),
        |v AS (
        |  SELECT event_type, hour, c,
        |    (ss - CAST(s AS DOUBLE) * s / n) / (n - 1) AS v,
        |    CAST(s AS DOUBLE) / n AS mean
        |  FROM w WHERE n >= 2)
        |SELECT event_type, hour, c,
        |  round(mean, 4) AS mean24,
        |  round((c - mean) / sqrt(v), 4) AS z
        |FROM v WHERE v > 0 AND abs((c - mean) / sqrt(v)) >= 2.0""".stripMargin,
    "events_retention" ->
      """WITH ud AS (SELECT DISTINCT user_id,
        |    CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT) AS day
        |  FROM events),
        |c AS (SELECT user_id, min(day) AS cohort_day FROM ud GROUP BY 1)
        |SELECT cohort_day, day - cohort_day AS day_offset,
        |  count(DISTINCT ud.user_id) AS n_users
        |FROM ud JOIN c USING (user_id)
        |GROUP BY 1, 2""".stripMargin,
    "events_tumbling" ->
      """SELECT CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 3600) * 3600 AS BIGINT) AS wstart,
        |  event_type, count(*) AS n, round(sum(value), 2) AS sum_val
        |FROM events GROUP BY 1, 2""".stripMargin,
    // identical window arithmetic: the streaming transform on batch
    // rows must produce exactly the batch answer
    "events_tumbling_stream" ->
      """SELECT CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 3600) * 3600 AS BIGINT) AS wstart,
        |  event_type, count(*) AS n, round(sum(value), 2) AS sum_val
        |FROM events GROUP BY 1, 2""".stripMargin,
    "events_sliding_stream" ->
      """SELECT CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 900) * 900 - k * 900 AS BIGINT) AS wstart,
        |  count(*) AS n
        |FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) offs
        |GROUP BY 1""".stripMargin,
    "events_session_stream" ->
      """WITH x AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |              OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |y AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |        ROWS UNBOUNDED PRECEDING) AS sid FROM x)
        |SELECT user_id,
        |  CAST(floor(epoch(CAST(min(ts) AS TIMESTAMP))) AS BIGINT) AS sstart,
        |  count(*) AS n
        |FROM y GROUP BY user_id, sid""".stripMargin,
    "events_sliding" ->
      """SELECT CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 900) * 900 - k * 900 AS BIGINT) AS wstart,
        |  count(*) AS n, round(sum(value), 2) AS sum_val
        |FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) offs
        |GROUP BY 1""".stripMargin,
    "events_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS vts FROM events
        |           WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(ts) AS cts FROM events e JOIN v USING (user_id)
        |      WHERE event_type = 'click' AND ts >= vts GROUP BY 1),
        |p AS (SELECT e.user_id, min(ts) AS pts FROM events e JOIN c USING (user_id)
        |      WHERE event_type = 'purchase' AND ts >= cts GROUP BY 1)
        |SELECT (SELECT count(*) FROM v) AS n_viewed,
        |       (SELECT count(*) FROM c) AS n_clicked,
        |       count(*) AS n_purchased,
        |       round(avg(CAST(floor(epoch(pts - vts)) AS BIGINT)), 2) AS avg_gap_s
        |FROM p JOIN v USING (user_id)""".stripMargin,
    "events_session" ->
      """WITH x AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |              OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |y AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |        ROWS UNBOUNDED PRECEDING) AS sid FROM x)
        |SELECT user_id,
        |  CAST(floor(epoch(CAST(min(ts) AS TIMESTAMP))) AS BIGINT) AS sstart,
        |  count(*) AS n, round(sum(value), 2) AS sum_val
        |FROM y GROUP BY user_id, sid""".stripMargin)
}
