package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.queries.Sketches

/** Sketch accuracy against exact answers: HLL estimates must land
  * within the configured error bounds, and the two-level union-merge
  * must agree with a single-level sketch over the same data.
  */
class SketchesSpec extends SparkSuite {

  private lazy val exactUsers: Map[String, Long] =
    Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("u"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap

  // m = 256 registers → rsd = 1.04/sqrt(256) ≈ 6.5%; assert 3×rsd.
  private val HllTol = 3 * 1.04 / math.sqrt(Sketches.HllM.toDouble)

  test("deterministic md5-register HLL within 3×rsd of exact") {
    val rows = Sketches.approxDistinct(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSet === exactUsers.keySet)
    rows.foreach { r =>
      val exact = exactUsers(r.getString(0)).toDouble
      assert(r.getLong(3).toDouble === exact) // in-frame exact column
      val est = r.getLong(2).toDouble
      assert(math.abs(est - exact) <= math.max(1.0, HllTol * exact),
        s"${r.getString(0)}: est=$est exact=$exact")
    }
  }

  test("two-level HLL merge within 3×rsd of exact distinct users") {
    Sketches.hllMerge(spark, sfDir).collect().foreach { r =>
      val exact = exactUsers(r.getString(0)).toDouble
      val est = r.getLong(2).toDouble
      assert(math.abs(est - exact) <= math.max(1.0, HllTol * exact),
        s"${r.getString(0)}: merged est=$est exact=$exact")
    }
  }

  test("register-max merge of per-day sketches == single sketch over all rows") {
    // max over (day-level max) ≡ max over all rows, so the merged
    // estimate must EXACTLY equal the single-level estimate that
    // approx_distinct computes from the same register algebra.
    val single = Sketches.approxDistinct(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val merged = Sketches.hllMerge(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(merged === single)
  }

  test("heavy_hitters two-pass ≡ naive groupBy-HAVING (exactness despite local prefilter)") {
    val naive = Tables.documents(spark, sfDir)
      .select(explode(graft.queries.Dedup.tokensCol(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .filter(col("n") >= Sketches.HeavyHitterThreshold)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val got = Sketches.heavyHitters(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === naive && got.nonEmpty)
  }

  test("heavy_hitters pigeonhole prefilter is superset-safe on a skewed planted corpus") {
    import spark.implicits._
    // one token exactly at the threshold, spread across many partitions
    // so every local count is far below T — the prefilter must still
    // keep it (local bound is T/P, not T)
    val t = Sketches.HeavyHitterThreshold.toInt
    val rows = (0 until t).map(i => (i.toLong, "needle")) ++
      (0 until 100).map(i => ((t + i).toLong, "hay unique" + i))
    val df = rows.toDF("doc_id", "text").repartition(16)
    val out = Sketches.heavyHittersOn(df).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out === Map("needle" -> t.toLong))
    // input wider than T/MinLocalFloor partitions: the candidate stage
    // must coalesce rather than let minLocal floor to 1 (which would
    // pass the whole vocabulary into the broadcast) — and stay exact
    val wide = rows.toDF("doc_id", "text").repartition(600)
    val outWide = Sketches.heavyHittersOn(wide).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(outWide === Map("needle" -> t.toLong))
  }

  test("heavy_hitters_mg ≡ exact heavy_hitters on sf0.001") {
    val exact = Sketches.heavyHitters(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val mg = Sketches.heavyHittersMg(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(mg === exact && mg.nonEmpty)
  }

  test("Misra-Gries candidate stage is superset-safe under eviction pressure") {
    import spark.implicits._
    import graft.functions.MisraGriesAggregator
    // vocabulary (k*4 distinct tokens) far exceeds the counter budget
    // (k=32), forcing constant decrement/eviction; the one true heavy
    // hitter must still be certified. n = t + 4k singletons, so the
    // undercount bound n/(k+1) stays below t.
    val k = 32
    val t = 200
    val stream = scala.util.Random.shuffle(
      (0 until t).map(_ => "needle").toVector ++
        (0 until 4 * k).map(i => "noise" + i).toVector)
    val cands = stream.toDF("tok").repartition(8).as[String]
      .select(MisraGriesAggregator.frequentCandidates(k, t.toLong))
      .toDF("cands").select(explode(col("cands")).as("tok"))
      .collect().map(_.getString(0)).toSet
    assert(cands.contains("needle"),
      s"true heavy hitter evicted; candidates=$cands")
    // candidate list is bounded by the counter budget, not vocabulary
    assert(cands.size <= k)
  }

  test("Misra-Gries merge of two halves certifies the same candidates as one pass") {
    import graft.functions.MisraGriesAggregator
    val k = 16
    val agg = new MisraGriesAggregator(k, 50L)
    val half1 = (0 until 60).map(_ => "hot") ++ (0 until 30).map(i => "a" + i)
    val half2 = (0 until 40).map(_ => "hot") ++ (0 until 30).map(i => "b" + i)
    val b1 = half1.foldLeft(agg.zero)(agg.reduce)
    val b2 = half2.foldLeft(agg.zero)(agg.reduce)
    val merged = agg.finish(agg.merge(b1, b2))
    val single = agg.finish((half1 ++ half2).foldLeft(agg.zero)(agg.reduce))
    assert(merged.contains("hot") && single.contains("hot"))
    // merged undercounts obey the same bound, so both certify supersets
    // of the true >=threshold set; exactness is restored by the verify
    // pass in heavyHittersMgOn
  }

  test("KMV audience overlap: exact on small sets, ~1/√k accurate on planted overlap") {
    import spark.implicits._
    def ev(t: String, ids: Range): Seq[(String, Long)] = ids.map(i => (t, i.toLong))
    // small sets (< k): exact mode — 60∪60 with 20 shared: union 100,
    // overlap 20, jaccard exactly 0.2
    val small = (ev("x", 0 until 60) ++ ev("y", 40 until 100))
      .toDF("event_type", "user_id")
    val exact = Sketches.audienceOverlapOn(small, k = 256).collect()(0)
    assert(exact.getDouble(2) === 100.0 && exact.getDouble(3) === 20.0)
    assert(math.abs(exact.getDouble(4) - 0.2) < 1e-9)
    // large planted overlap: |A|=|B|=1000, |A∩B|=500, jac = 1/3
    val big = (ev("x", 0 until 1000) ++ ev("y", 500 until 1500))
      .toDF("event_type", "user_id")
    val est = Sketches.audienceOverlapOn(big, k = 256).collect()(0)
    assert(math.abs(est.getDouble(2) - 1500.0) / 1500.0 < 0.2, est.toString)
    assert(math.abs(est.getDouble(3) - 500.0) / 500.0 < 0.35, est.toString)
    assert(math.abs(est.getDouble(4) - 1.0 / 3) < 0.12, est.toString)
    // identical sets → jaccard exactly 1; disjoint → exactly 0
    val same = (ev("x", 0 until 2000) ++ ev("y", 0 until 2000))
      .toDF("event_type", "user_id")
    assert(Sketches.audienceOverlapOn(same, k = 128).collect()(0).getDouble(4) === 1.0)
    val disj = (ev("x", 0 until 2000) ++ ev("y", 5000 until 7000))
      .toDF("event_type", "user_id")
    assert(Sketches.audienceOverlapOn(disj, k = 128).collect()(0).getDouble(4) === 0.0)
  }

  test("audience_overlap estimates track exact pairwise user-set jaccard on sf0.001") {
    val users = Tables.events(spark, sfDir)
      .select("event_type", "user_id").distinct().collect()
      .groupBy(_.getString(0)).map { case (t, rs) => t -> rs.map(_.getLong(1)).toSet }
    val rows = Sketches.audienceOverlap(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (users(r.getString(0)), users(r.getString(1)))
      val jac = (a & b).size.toDouble / (a | b).size
      assert(math.abs(r.getDouble(4) - jac) < 0.15,
        s"${r.getString(0)}/${r.getString(1)}: est=${r.getDouble(4)} exact=$jac")
    }
  }

  test("share-based Misra-Gries rejects share <= 1/(k+1) at construction") {
    import graft.functions.MisraGriesShareAggregator
    intercept[IllegalArgumentException](new MisraGriesShareAggregator(9, 0.1))
    // valid share: certifies the planted heavy fraction
    val agg = new MisraGriesShareAggregator(32, 0.2)
    val stream = (0 until 60).map(_ => "hot") ++ (0 until 140).map(i => "u" + i)
    val out = agg.finish(stream.foldLeft(agg.zero)(agg.reduce))
    assert(out.contains("hot"))
  }

  test("Misra-Gries fails loudly when k is too small for the stream") {
    import graft.functions.MisraGriesAggregator
    val agg = new MisraGriesAggregator(2, 10L)
    // n = 100 singletons => undercount bound 33 >= threshold 10
    val buf = (0 until 100).map(i => "x" + i).foldLeft(agg.zero)(agg.reduce)
    intercept[IllegalArgumentException](agg.finish(buf))
  }

  test("quantile sketch: partitioning-invariant, rank error within the uniform-sample bound") {
    import spark.implicits._
    // merge-order / partitioning invariance: identical output however
    // the rows are split before the partial aggregation
    def run(parts: Int): Map[String, (Int, Long, Long, Long)] = {
      val docs = Tables.documents(spark, sfDir).repartition(parts)
      val agg = new graft.functions.QuantileSketchAggregator(Sketches.QuantK)
      docs.select(col("source"),
          ((conv(substring(md5(concat(lit("qsk:"), col("doc_id").cast("string"))), 1, 12),
            16, 10).cast("double") + lit(0.5)) / lit(281474976710656.0)).as("h"),
          size(graft.queries.Dedup.tokensCol(col("text"))).cast("long").as("ntok"))
        .as[(String, Double, Long)]
        .groupByKey(_._1).mapValues(t => (t._2, t._3))
        .agg(agg.toColumn.name("vals"))
        .collect().map { case (src, vals) =>
          def pick(q: Double) = vals(math.ceil(q * vals.size).toInt - 1)
          src -> ((vals.size, pick(0.5), pick(0.9), pick(0.99)))
        }.toMap
    }
    val one = run(1)
    val many = run(13)
    assert(one === many, "sketch must not depend on partitioning")

    // rank error: each estimate's true rank within its source must sit
    // within q ± 2.5/sqrt(k) (the uniform-sample deviation bound)
    val eps = 2.5 / math.sqrt(Sketches.QuantK.toDouble)
    val exact = Tables.documents(spark, sfDir)
      .select(col("source"), size(graft.queries.Dedup.tokensCol(col("text"))).cast("long").as("ntok"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toIndexedSeq).toMap
    one.foreach { case (src, (_, p50, p90, p99)) =>
      val vals = exact(src)
      def rankOf(v: Long) = vals.count(_ <= v).toDouble / vals.size
      Seq(0.5 -> p50, 0.9 -> p90, 0.99 -> p99).foreach { case (q, est) =>
        val r = rankOf(est)
        assert(r >= q - eps && r <= math.min(1.0, q + eps) + 1e-9,
          s"$src q=$q: est=$est has rank $r outside ±$eps")
      }
    }

    // exact mode: a group smaller than k answers discrete quantiles exactly
    val small = exact.head
    assert(small._2.size < Sketches.QuantK, "fixture assumption: per-source n < k")
    val (_, p50s, _, p99s) = one(small._1)
    def dq(vals: IndexedSeq[Long], q: Double) = vals(math.ceil(q * vals.size).toInt - 1)
    assert(p50s === dq(small._2, 0.5) && p99s === dq(small._2, 0.99))
  }
}
