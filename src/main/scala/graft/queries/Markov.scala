package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Markov-chain attribution ([EXT]) — the removal-effect model
  * (Anderl et al. 2014): user journeys become a first-order chain
  * START → touchpoints → {CONV, NULL}; a channel's credit is how much
  * the chain's conversion probability drops when every transition
  * into that channel is redirected to NULL.
  *
  * Exactness: transition probabilities are int64 MICRO-unit floor
  * ratios of exact counts; absorption runs [[MarkovSteps]] truncated
  * power-iteration steps with every product floor-quantized to
  * nano-units BEFORE summing — all-integer, so the whole readout
  * reproduces bit-for-bit in the SQL oracle (the classifier_train
  * integer-GD convention applied to a Markov chain).
  *
  * Scale shape: journeys never leave the cluster — one per-user
  * window pass produces (src,dst) steps, aggregated to a
  * |states|²-bounded cell table. Only that constant-size cell frame
  * is collected (the kmeans k·dim convention); the chain algebra is
  * O(states²·steps) driver arithmetic. Output is one row per
  * declared channel.
  */
object Markov {

  /** Power-iteration truncation — matches the oracle's unrolled CTE
    * chain step for step. */
  val MarkovSteps = 24

  /** Attribution channels (touchpoint event types; `purchase` is the
    * conversion event, not a channel). Declared config, as in a real
    * attribution setup — absent channels get removal effect 0. */
  val Channels = Seq("click", "view", "signup", "error")

  /** (src, dst, count) journey-step cells: START→first, step→step
    * along each user's stream truncated at the FIRST purchase
    * (mapped to the absorbing CONV state 'C'), and last→NULL 'N'
    * for non-converting users. */
  private def transitionCells(s: SparkSession, d: String): DataFrame = {
    val rnW = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("rn", row_number().over(rnW))
    val fp = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(min("rn").as("prn"))
    val pref = ev.join(fp, Seq("user_id"), "left")
      .filter(col("prn").isNull || col("rn") <= col("prn"))
      .select(col("user_id"), col("rn"),
        when(col("event_type") === "purchase", lit("C"))
          .otherwise(col("event_type")).as("st"))
    val stepW = Window.partitionBy("user_id").orderBy("rn")
    val uW = Window.partitionBy("user_id")
    val steps = pref
      .withColumn("prev", lag("st", 1).over(stepW))
      .withColumn("lastrn", max("rn").over(uW))
    val walk = steps.select(
      coalesce(col("prev"), lit("S")).as("src"), col("st").as("dst"))
    val ends = steps.filter(col("rn") === col("lastrn") && col("st") =!= "C")
      .select(col("st").as("src"), lit("N").as("dst"))
    walk.unionAll(ends).groupBy("src", "dst").agg(count(lit(1)).as("c"))
  }

  /** One truncated absorption run over micro-unit transition rows:
    * start mass 1e9 nano on 'S'; per step each transient state's mass
    * flows out as Σ floor(p·t/1e6), absorbing states retain. Returns
    * final mass on 'C'. */
  private def absorb(t: Map[(String, String), Long]): Long = {
    var p = Map("S" -> 1000000000L)
    for (_ <- 1 to MarkovSteps) {
      val inflow = t.toSeq.flatMap { case ((src, dst), tm) =>
        p.get(src).map(ps => dst -> ps * tm / 1000000L)
      }
      val keep = p.view.filterKeys(k => k == "C" || k == "N").toSeq
      p = (inflow ++ keep).groupBy(_._1)
        .map { case (k, vs) => k -> vs.map(_._2).sum }
    }
    p.getOrElse("C", 0L)
  }

  /** Removal-effect attribution readout: per channel, the base and
    * channel-removed conversion mass, the micro-quantized removal
    * effect 1 − conv_rm/conv, and each channel's share of the total
    * removal effect. */
  def attributionMarkov(s: SparkSession, d: String): DataFrame = {
    val cells = transitionCells(s, d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val rowSum = cells.groupBy(_._1._1).map { case (src, cs) => src -> cs.values.sum }
    val t = cells.map { case ((src, dst), c) =>
      (src, dst) -> c * 1000000L / rowSum(src) }
    val base = absorb(t)
    val removed = Channels.map { ch =>
      val tx = t.toSeq
        .map { case ((src, dst), tm) => (src, if (dst == ch) "N" else dst) -> tm }
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
      ch -> absorb(tx)
    }
    val rem = removed.map { case (ch, cx) =>
      ch -> (if (base == 0) 0L else 1000000L - cx * 1000000L / base) }
    val totRem = rem.map(_._2).sum
    val rows = removed.zip(rem).map { case ((ch, cx), (_, re)) =>
      (ch, base, cx, re, if (totRem == 0) 0L else re * 1000000L / totRem)
    }
    import s.implicits._
    rows.toDF("channel", "conv_base_nano", "conv_removed_nano",
      "removal_micro", "share_micro")
  }

  /** Channel → bitmask bit, in declared order. */
  private val ChannelBits: Seq[(String, Long)] =
    Channels.zipWithIndex.map { case (ch, i) => ch -> (1L << i) }

  /** Shapley-value attribution (Shapley '53 via the coalition-game
    * formulation of Dalessandro et al. 2012): the characteristic
    * function v(S) counts conversions among journeys whose touched-
    * channel set ⊆ S, and each channel's credit is its exact Shapley
    * value — computed over all 2^|channels| coalitions, scaled by
    * |channels|! = 24 so every weight is an integer and the whole
    * readout is integer-exact (φ24 = Σ_S |S|!(n−1−|S|)!·(v(S∪c)−v(S))).
    *
    * Scale shape: journeys reduce distributively to a 2^|channels|-
    * bounded (mask → conversions) cell table; only that constant
    * frame is collected, and the coalition algebra is O(4^n) driver
    * arithmetic over a declared constant n=4. One row per channel
    * with the 24-scaled value, its micro share, and the full/empty
    * coalition conversions.
    */
  def attributionShapley(s: SparkSession, d: String): DataFrame = {
    val rnW = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("rn", row_number().over(rnW))
    val fp = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(min("rn").as("prn"))
    val bitExpr = ChannelBits.foldLeft(when(lit(false), lit(0L))) {
      case (acc, (ch, bit)) => acc.when(col("event_type") === ch, lit(bit))
    }.otherwise(lit(0L))
    val j = ev.join(fp, Seq("user_id"), "left")
      .filter(col("prn").isNull || col("rn") <= col("prn"))
      .select(col("user_id"), col("event_type"), bitExpr.as("bit"))
      .groupBy("user_id")
      .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("conv"),
        sum_distinct(col("bit")).as("mask"))
    val cells = j.groupBy("mask").agg(sum("conv").as("nc")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = (1L << Channels.length) - 1
    def v(coal: Long): Long =
      cells.collect { case (m, nc) if (m & ~coal) == 0 => nc }.sum
    // |S|!(n−1−|S|)!, n = 4 — integer Shapley weights at scale 24
    val w24 = Array(6L, 2L, 2L, 6L)
    val phi = ChannelBits.map { case (ch, bit) =>
      val total = (0L to full).filter(cs => (cs & bit) == 0).map { cs =>
        w24(java.lang.Long.bitCount(cs)) * (v(cs | bit) - v(cs))
      }.sum
      (ch, total)
    }
    val tphi = phi.map(_._2).sum
    val rows = phi.map { case (ch, p) =>
      (ch, p, if (tphi == 0) 0L else p * 1000000L / tphi, v(full), v(0L))
    }
    import s.implicits._
    rows.toDF("channel", "phi24", "share_micro", "conv_full", "conv_none")
  }

  /** Stationary-attention readout ([EXT]): 24 truncated power-
    * iteration steps on the FULL journey transition matrix (every
    * adjacent step, no absorbing truncation — the long-run share of
    * user attention per event type, the non-absorbing complement of
    * [[attributionMarkov]]). Same integer rails: micro transition
    * rows, nano mass floor-quantized per term; mass that reaches a
    * state with no outgoing edges decays (truncated iteration, the
    * oracle runs the identical chain). Cells are |types|²-bounded;
    * only they are collected.
    */
  def journeyStationary(s: SparkSession, d: String): DataFrame = {
    val stepW = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val cells = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("dst"))
      .withColumn("src", lag("dst", 1).over(stepW))
      .filter(col("src").isNotNull)
      .groupBy("src", "dst").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val rowSum = cells.groupBy(_._1._1).map { case (s0, cs) => s0 -> cs.values.sum }
    val t = cells.map { case ((a, b), c) => (a, b) -> c * 1000000L / rowSum(a) }
    val states = (cells.keys.map(_._1) ++ cells.keys.map(_._2)).toSeq.distinct.sorted
    val p0 = 1000000000L / states.length
    var p = states.map(_ -> p0).toMap
    for (_ <- 1 to MarkovSteps) {
      p = t.toSeq.flatMap { case ((src, dst), tm) =>
        p.get(src).map(ps => dst -> ps * tm / 1000000L)
      }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    }
    import s.implicits._
    states.map(st => (st, p0, p.getOrElse(st, 0L)))
      .toDF("state", "p0_nano", "stationary_nano")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "attribution_markov" -> attributionMarkov,
    "attribution_shapley" -> attributionShapley,
    "journey_stationary" -> journeyStationary)

  def oracleSql: Map[String, String] = Map(
    "journey_stationary" -> {
      val chain = (1 to MarkovSteps).map { k =>
        s"""p_$k AS MATERIALIZED (
           |  SELECT t.dst AS state, CAST(sum(p.p * t.t // 1000000) AS BIGINT) AS p
           |  FROM t JOIN p_${k - 1} p ON p.state = t.src
           |  GROUP BY t.dst)""".stripMargin
      }.mkString(",\n")
      s"""WITH ev AS (
         |  SELECT user_id, event_type AS dst,
         |    lag(event_type) OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS src
         |  FROM events),
         |cnt AS (SELECT src, dst, count(*) AS c FROM ev
         |        WHERE src IS NOT NULL GROUP BY 1, 2),
         |rt AS (SELECT src, CAST(sum(c) AS BIGINT) AS r FROM cnt GROUP BY src),
         |t AS MATERIALIZED (
         |  SELECT c.src, c.dst, CAST(c.c * 1000000 // r.r AS BIGINT) AS t
         |  FROM cnt c JOIN rt r USING (src)),
         |states AS (SELECT DISTINCT src AS state FROM cnt
         |           UNION SELECT DISTINCT dst FROM cnt),
         |n_st AS (SELECT count(*) AS n FROM states),
         |p_0 AS (SELECT state, CAST(1000000000 // n.n AS BIGINT) AS p
         |        FROM states CROSS JOIN n_st n),
         |$chain
         |SELECT s.state,
         |  (SELECT CAST(1000000000 // n AS BIGINT) FROM n_st) AS p0_nano,
         |  coalesce(p.p, 0) AS stationary_nano
         |FROM states s LEFT JOIN p_$MarkovSteps p ON p.state = s.state""".stripMargin
    },
    "attribution_shapley" -> {
      val caseBits = ChannelBits.map { case (ch, b) => s"WHEN '$ch' THEN $b" }
        .mkString(" ")
      val chRows = ChannelBits.map { case (ch, b) => s"('$ch', $b)" }
        .mkString(", ")
      """WITH ev AS (
        |  SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS rn
        |  FROM events),
        |fp AS (SELECT user_id, min(rn) AS prn FROM ev
        |       WHERE event_type = 'purchase' GROUP BY user_id),
        |j AS (
        |  SELECT e.user_id,
        |    CAST(max(CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS conv,
        |    CAST(sum(DISTINCT CASE e.event_type """.stripMargin +
        caseBits +
        s""" ELSE 0 END) AS BIGINT) AS mask
          |  FROM ev e LEFT JOIN fp f ON f.user_id = e.user_id
          |  WHERE f.prn IS NULL OR e.rn <= f.prn
          |  GROUP BY e.user_id),
          |cells AS (SELECT mask, CAST(sum(conv) AS BIGINT) AS nc
          |          FROM j GROUP BY mask),
          |co AS (SELECT unnest(generate_series(0, 15)) AS cs),
          |v AS MATERIALIZED (
          |  SELECT co.cs, CAST(coalesce(sum(c.nc), 0) AS BIGINT) AS v
          |  FROM co LEFT JOIN cells c ON (c.mask & (15 - co.cs)) = 0
          |  GROUP BY co.cs),
          |ch AS (SELECT * FROM (VALUES $chRows) AS t(channel, bit)),
          |phi AS (
          |  SELECT ch.channel,
          |    CAST(sum((CASE ((s.cs & 1) + ((s.cs // 2) & 1)
          |                    + ((s.cs // 4) & 1) + ((s.cs // 8) & 1))
          |              WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2 ELSE 6 END)
          |             * (vc.v - vs.v)) AS BIGINT) AS phi24
          |  FROM ch JOIN co s ON (s.cs & ch.bit) = 0
          |  JOIN v vs ON vs.cs = s.cs
          |  JOIN v vc ON vc.cs = s.cs + ch.bit
          |  GROUP BY ch.channel),
          |tot AS (SELECT CAST(sum(phi24) AS BIGINT) AS tphi FROM phi)
          |SELECT p.channel, p.phi24,
          |  CASE WHEN t.tphi = 0 THEN 0
          |       ELSE CAST(p.phi24 * 1000000 // t.tphi AS BIGINT)
          |  END AS share_micro,
          |  (SELECT v FROM v WHERE cs = 15) AS conv_full,
          |  (SELECT v FROM v WHERE cs = 0) AS conv_none
          |FROM phi p CROSS JOIN tot t""".stripMargin
    },
    "attribution_markov" -> {
      // every step CTE is MATERIALIZED — each references its
      // predecessor twice (flow join + absorbing-retention union), so
      // DuckDB's default CTE inlining would expand the 24-step chain
      // exponentially (2^24 scans of the events table)
      def chain(tag: String, tcte: String): String =
        (1 to MarkovSteps).map { k =>
          val prev = if (k == 1) s"p${tag}_0" else s"p${tag}_${k - 1}"
          s"""p${tag}_$k AS MATERIALIZED (
             |  SELECT dst AS state, CAST(sum(term) AS BIGINT) AS p FROM (
             |    SELECT t.dst, p.p * t.t // 1000000 AS term
             |    FROM $tcte t JOIN $prev p ON p.state = t.src
             |    UNION ALL
             |    SELECT state, p FROM $prev WHERE state IN ('C', 'N'))
             |  GROUP BY dst)""".stripMargin
        }.mkString(",\n")
      val scenarios = Channels.map { ch =>
        s"""t_$ch AS MATERIALIZED (
           |  SELECT src, CASE WHEN dst = '$ch' THEN 'N' ELSE dst END AS dst,
           |    CAST(sum(t) AS BIGINT) AS t
           |  FROM t GROUP BY 1, 2),
           |p${ch}_0 AS (SELECT 'S' AS state, CAST(1000000000 AS BIGINT) AS p),
           |${chain(ch, s"t_$ch")}""".stripMargin
      }.mkString(",\n")
      val resRows = Channels.map { ch =>
        s"""SELECT '$ch' AS channel,
           |  coalesce((SELECT p FROM p${ch}_$MarkovSteps WHERE state = 'C'), 0)
           |    AS conv_removed_nano""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH ev AS (
         |  SELECT user_id, event_type,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS rn
         |  FROM events),
         |fp AS (SELECT user_id, min(rn) AS prn FROM ev
         |       WHERE event_type = 'purchase' GROUP BY user_id),
         |pref AS (
         |  SELECT e.user_id, e.rn,
         |    CASE WHEN e.event_type = 'purchase' THEN 'C'
         |         ELSE e.event_type END AS st
         |  FROM ev e LEFT JOIN fp ON fp.user_id = e.user_id
         |  WHERE fp.prn IS NULL OR e.rn <= fp.prn),
         |steps AS (
         |  SELECT user_id, rn, st,
         |    lag(st) OVER (PARTITION BY user_id ORDER BY rn) AS prev,
         |    max(rn) OVER (PARTITION BY user_id) AS lastrn
         |  FROM pref),
         |trans0 AS (
         |  SELECT coalesce(prev, 'S') AS src, st AS dst FROM steps
         |  UNION ALL
         |  SELECT st, 'N' FROM steps WHERE rn = lastrn AND st <> 'C'),
         |cnt AS (SELECT src, dst, count(*) AS c FROM trans0 GROUP BY 1, 2),
         |rt AS (SELECT src, CAST(sum(c) AS BIGINT) AS r FROM cnt GROUP BY src),
         |t AS MATERIALIZED (
         |  SELECT c.src, c.dst, CAST(c.c * 1000000 // r.r AS BIGINT) AS t
         |  FROM cnt c JOIN rt r USING (src)),
         |pb_0 AS (SELECT 'S' AS state, CAST(1000000000 AS BIGINT) AS p),
         |${chain("b", "t")},
         |$scenarios,
         |base AS (
         |  SELECT coalesce((SELECT p FROM pb_$MarkovSteps WHERE state = 'C'), 0)
         |    AS conv_base_nano),
         |res AS (
         |$resRows),
         |rem AS (
         |  SELECT r.channel, r.conv_removed_nano,
         |    CASE WHEN b.conv_base_nano = 0 THEN 0
         |         ELSE CAST(1000000 - r.conv_removed_nano * 1000000
         |                     // b.conv_base_nano AS BIGINT)
         |    END AS removal_micro
         |  FROM res r CROSS JOIN base b),
         |tot AS (SELECT CAST(sum(removal_micro) AS BIGINT) AS trem FROM rem)
         |SELECT r.channel, b.conv_base_nano, r.conv_removed_nano,
         |  r.removal_micro,
         |  CASE WHEN t.trem = 0 THEN 0
         |       ELSE CAST(r.removal_micro * 1000000 // t.trem AS BIGINT)
         |  END AS share_micro
         |FROM rem r CROSS JOIN base b CROSS JOIN tot t""".stripMargin
    })
}
