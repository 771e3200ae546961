package graft

import org.apache.spark.sql.functions._
import graft.plans.BandJoin

/** The custom band-join physical operator: planted-shape semantics
  * (inclusive edges, key isolation, one row per match, empty bands),
  * equality with the declarative inequality join on real data, buffer
  * behavior across key changes and overlapping bands, and the plan
  * contract (BandJoinExec node, SMJ-shaped exchanges+sorts, no BNLJ).
  */
class BandExecSpec extends SparkSuite {
  import spark.implicits._

  test("planted shapes: inclusive edges, key isolation, multi-match") {
    val l = Seq(
      (1L, 100L, "a1"), (1L, 300L, "a2"),
      (2L, 100L, "b1"), // key with no right rows
      (3L, 100L, "c1")  // right rows exist, all out of band
    ).toDF("k", "ts", "l")
    val r = Seq(
      (1L, 80L, "r80"), (1L, 100L, "r100"), (1L, 120L, "r120"),
      (1L, 280L, "r280"), (1L, 321L, "r321"),
      (3L, 500L, "rfar")
    ).toDF("rk", "rts", "r")
    val got = BandJoin.band(l, r, "k", "rk", "ts", "rts", 20L, 20L)
      .select("k", "ts", "l", "r").collect()
      .map(x => (x.getLong(0), x.getString(2), x.getString(3))).toSet
    assert(got === Set(
      (1L, "a1", "r80"),   // left edge inclusive: 100-20
      (1L, "a1", "r100"),
      (1L, "a1", "r120"),  // right edge inclusive: 100+20
      (1L, "a2", "r280"))) // r321 is out (301..320 band); b1/c1 emit nothing
  }

  test("asymmetric band and duplicate right timestamps multiply") {
    val l = Seq((1L, 100L, "x")).toDF("k", "ts", "l")
    val r = Seq((1L, 95L, "p"), (1L, 95L, "q"), (1L, 104L, "s"),
      (1L, 105L, "t")).toDF("rk", "rts", "r")
    val got = BandJoin.band(l, r, "k", "rk", "ts", "rts", 5L, 4L)
      .select("r").collect().map(_.getString(0)).sorted.toSeq
    assert(got == Seq("p", "q", "s")) // both 95s match; 105 > 100+4
  }

  test("overlapping bands re-emit buffered rows; key change evicts") {
    val l = Seq((1L, 100L, "e1"), (1L, 110L, "e2"), (2L, 100L, "f1"))
      .toDF("k", "ts", "l")
    val r = Seq((1L, 105L, "m"), (2L, 105L, "n")).toDF("rk", "rts", "r")
    val got = BandJoin.band(l, r, "k", "rk", "ts", "rts", 10L, 10L)
      .select("l", "r").collect()
      .map(x => (x.getString(0), x.getString(1))).toSet
    // m is inside BOTH e1's and e2's bands (one buffer, two emissions);
    // f1 must see only its own key's row
    assert(got === Set(("e1", "m"), ("e2", "m"), ("f1", "n")))
  }

  test("null keys and timestamps never match and never NPE") {
    val l = Seq((Some(1L), Some(100L), "a"), (None, Some(100L), "b"),
      (Some(1L), None, "c")).toDF("k", "ts", "l")
    val r = Seq((Some(1L), Some(100L), "m"), (None, Some(100L), "x"),
      (Some(1L), None, "y")).toDF("rk", "rts", "r")
    val got = BandJoin.band(l, r, "k", "rk", "ts", "rts", 10L, 10L)
      .select("l", "r").collect()
      .map(x => (x.getString(0), x.getString(1))).toSet
    assert(got === Set(("a", "m")))
  }

  test("join_band_exec ≡ declarative inequality join on sf0.001") {
    val ev = graft.core.Tables.events(spark, sfDir)
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("err_id"),
        col("ts").as("ets"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("cts"))
    val bandNs = 600L * 1000000000L
    val exec = graft.queries.Temporal.joinBandExec(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val decl = errors.join(clicks,
        col("c_user") === col("user_id")
          && col("cts") >= col("ets") - bandNs
          && col("cts") <= col("ets") + bandNs)
      .select(col("err_id"), col("user_id"), col("click_id"),
        (col("cts") - col("ets")).as("offset_ns"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(exec == decl, s"exec ${exec.size} rows vs declarative ${decl.size}")
    assert(exec.nonEmpty)
  }

  test("contract enforced at plan build: bad types and negative bounds") {
    val l = Seq((1L, 1.5, "a")).toDF("k", "ts", "l")
    val r = Seq((1L, 1.5, "m")).toDF("rk", "rts", "r")
    intercept[IllegalArgumentException] {
      BandJoin.band(l, r, "k", "rk", "ts", "rts", 1L, 1L) // double ts
    }
    val l2 = Seq((1L, 10L, "a")).toDF("k", "ts", "l")
    val r2 = Seq((1L, 10L, "m")).toDF("rk", "rts", "r")
    intercept[IllegalArgumentException] {
      BandJoin.band(l2, r2, "k", "rk", "ts", "rts", -1L, 1L)
    }
  }

  test("plan contract: BandJoinExec with SMJ-shaped exchanges, no BNLJ") {
    val df = graft.queries.Temporal.joinBandExec(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BandJoin"), s"no BandJoin node:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "band join fell back to BNLJ")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges >= 2, s"expected both sides exchanged:\n$plan")
    assert(plan.contains("Sort "), "expected sorts under the band join")
  }

  test("bucketed inputs elide the exchanges: co-located band join") {
    val l = Seq.tabulate(100)(i => (i.toLong % 7, i.toLong * 10, s"l$i"))
      .toDF("k", "ts", "l")
    val r = Seq.tabulate(80)(i => (i.toLong % 7, i.toLong * 13, s"r$i"))
      .toDF("rk", "rts", "r")
    def write(name: String, df: org.apache.spark.sql.DataFrame,
        key: String, ts: String): Unit =
      if (!spark.catalog.tableExists(name)) {
        val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
        val stale = new java.io.File(s"$wh/$name")
        if (stale.exists()) {
          def rm(f: java.io.File): Unit = {
            Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
          }
          rm(stale)
        }
        df.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .bucketBy(4, key).sortBy(key, ts).saveAsTable(name)
      }
    write("band_left_bkt", l, "k", "ts")
    write("band_right_bkt", r, "rk", "rts")
    val df = BandJoin.band(
      spark.table("band_left_bkt"), spark.table("band_right_bkt"),
      "k", "rk", "ts", "rts", 25L, 25L)
    val got = df.select("l", "r").collect()
      .map(x => (x.getString(0), x.getString(1))).toSet
    val plan = df.queryExecution.executedPlan.toString
    val idx = plan.indexOf("BandJoin")
    assert(idx >= 0, plan)
    assert(!plan.substring(idx).contains("Exchange"),
      s"bucketed band join must read co-located buckets, not shuffle:\n$plan")
    val plain = BandJoin.band(l, r, "k", "rk", "ts", "rts", 25L, 25L)
      .select("l", "r").collect()
      .map(x => (x.getString(0), x.getString(1))).toSet
    assert(got === plain)
    assert(got.nonEmpty)
  }
}
