package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.ScalableRank

/** Direct contracts for the two-pass total-order primitives that
  * replaced every corpus-scale unpartitioned window (PlanLintSpec's
  * gate): equality with the window forms they replaced (on test-sized
  * data where the window is safe), SQL-NTILE semantics across the
  * (n, k) grid, boundary-placement independence (partition count must
  * not change the result), and null handling.
  */
class ScalableRankSpec extends SparkSuite {
  import spark.implicits._

  // deterministic pseudo-random rows with heavy key ties
  private lazy val rows: Seq[(Long, Long, Long)] =
    (1L to 257L).map { i =>
      val k = (i * 2654435761L) % 13 // tie-heavy sort key
      val v = (i * 40503L) % 97
      (k, i, v) // (key, id, value)
    }

  test("rowNumber == row_number() over the same total order") {
    val df = rows.toDF("k", "id", "v")
    val got = ScalableRank
      .rowNumber(df, "rn", col("k").asc, col("id").asc)
      .select("id", "rn").as[(Long, Long)].collect().toMap
    val want = df
      .withColumn("rn", row_number().over(Window.orderBy(col("k").asc, col("id").asc)).cast("long"))
      .select("id", "rn").as[(Long, Long)].collect().toMap
    assert(got === want)
  }

  test("rowNumber is partition-count independent (boundary placement must not matter)") {
    val df = rows.toDF("k", "id", "v")
    val a = ScalableRank
      .rowNumberWith(df, "rn", 1, col("k").asc, col("id").asc)
      .select("id", "rn").as[(Long, Long)].collect().toMap
    Seq(2, 7, 32).foreach { parts =>
      val b = ScalableRank
        .rowNumberWith(df, "rn", parts, col("k").asc, col("id").asc)
        .select("id", "rn").as[(Long, Long)].collect().toMap
      assert(b === a, s"parts=$parts changed the sequence")
    }
  }

  test("prefixSums (two columns, one pass) == running-sum windows") {
    val df = rows.toDF("k", "id", "v")
      .withColumn("w", (col("v") * 3 + 1).cast("long"))
    val got = ScalableRank
      .prefixSums(df, Seq("v", "w"), Seq("cv", "cw"),
        col("k").asc, col("id").asc)
      .select("id", "cv", "cw").as[(Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    val win = Window.orderBy(col("k").asc, col("id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df
      .withColumn("cv", sum("v").over(win))
      .withColumn("cw", sum("w").over(win))
      .select("id", "cv", "cw").as[(Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got === want)
  }

  test("prefixSum counts nulls as 0") {
    val df = Seq((1L, Some(5L)), (2L, None), (3L, Some(7L)))
      .toDF("id", "v")
    val got = ScalableRank.prefixSum(df, "v", "c", col("id").asc)
      .select("id", "c").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 5L, 2L -> 5L, 3L -> 12L))
  }

  test("ntileExpr == SQL NTILE for every (n, k) on the grid, including n < k") {
    (0 to 41).foreach { n =>
      Seq(1, 2, 3, 7, 10, 64).foreach { k =>
        // closed form from (rn, n)
        val got = if (n == 0) Seq.empty else
          spark.range(1, n + 1).toDF("rn")
            .withColumn("n_total", lit(n.toLong))
            .withColumn("t", ScalableRank.ntileExpr("rn", "n_total", k))
            .select("rn", "t").as[(Long, Long)].collect().sortBy(_._1).map(_._2).toSeq
        // Spark's window NTILE over the same order
        val want = if (n == 0) Seq.empty else
          spark.range(1, n + 1).toDF("rn")
            .withColumn("t", ntile(k).over(Window.orderBy("rn")).cast("long"))
            .select("rn", "t").as[(Long, Long)].collect().sortBy(_._1).map(_._2).toSeq
        assert(got === want, s"n=$n k=$k: $got vs $want")
      }
    }
  }

  test("rowNumber on an empty frame is empty; prefixSums on one row is that row") {
    val empty = Seq.empty[(Long, Long)].toDF("k", "id")
    assert(ScalableRank.rowNumber(empty, "rn", col("k").asc).count() === 0L)
    val one = Seq((1L, 9L)).toDF("id", "v")
    val got = ScalableRank.prefixSum(one, "v", "c", col("id").asc)
      .select("c").as[Long].collect()
    assert(got.toSeq === Seq(9L))
  }

  test("the plan is ONE range exchange under the custom operator — lazy, no Row hop") {
    // boundary consistency between the subtotal job and the output
    // pass is structural (GlobalRunningSumExec executes its child
    // once); the plan must show exactly one range exchange feeding
    // the operator, and nothing may execute at construction time
    val df = rows.toDF("k", "id", "v")
    val out = ScalableRank
      .rowNumberWith(df, "rn", 7, col("k").asc, col("id").asc)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("GlobalRunningSum"), s"missing operator:\n$plan")
    assert("Exchange rangepartitioning".r.findAllIn(plan).size === 1,
      s"expected exactly one range exchange:\n$plan")
  }

  test("rowNumber under heavy skew at many partitions (boundary divergence would misrank)") {
    // 90% of keys equal → range boundaries depend strongly on the
    // sample; if the two passes ever sampled independently, offsets
    // would disagree with partition sizes and the sequence would have
    // gaps/duplicates. Assert the exact permutation 1..N.
    val skew = (1L to 5000L).map(i => (if (i % 10 == 0) i else 7L, i))
      .toDF("k", "id")
    val rns = ScalableRank
      .rowNumberWith(skew, "rn", 32, col("k").asc, col("id").asc)
      .select("rn").as[Long].collect().sorted
    assert(rns.toSeq === (1L to 5000L))
  }

  test("groupedRank keeps NULL group keys (window PARTITION BY semantics)") {
    val df = Seq((Some("a"), 1L), (None, 2L), (Some("b"), 3L),
      (None, 4L), (Some("a"), 5L)).toDF("g", "id")
    val got = ScalableRank.groupedRank(df, "g", "rn", "n", col("id").asc)
      .select("id", "rn", "n").as[(Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    val w = Window.partitionBy("g").orderBy("id")
    val want = df
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("g")))
      .select("id", "rn", "n").as[(Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got === want) // an equi-join on g would have dropped ids 2 and 4
  }

  test("groupedPrefixSums: all-NULL group sums are 0-based, NULL groups kept") {
    val df = Seq((Some("a"), 1L, Some(3L)), (None, 2L, None),
      (None, 3L, None), (Some("a"), 4L, Some(2L))).toDF("g", "id", "v")
    val got = ScalableRank
      .groupedPrefixSums(df, "g", Seq("v"), Seq("c"), col("id").asc)
      .select("id", "c").as[(Long, Long)].collect().toMap
    // nulls count as 0 (ungrouped contract), incl. the all-null group
    assert(got === Map(1L -> 3L, 2L -> 0L, 3L -> 0L, 4L -> 5L))
  }

  test("prefixSums casts integer value columns and rejects non-integral ones up front") {
    val ints = Seq((1, 1L), (2, 2L)).toDF("v", "id")
    val got = ScalableRank.prefixSum(ints, "v", "c", col("id").asc)
      .select("c").as[Long].collect().sorted
    assert(got.toSeq === Seq(1L, 3L))
    val doubles = Seq((1.5, 1L)).toDF("v", "id")
    val e = intercept[IllegalArgumentException] {
      ScalableRank.prefixSum(doubles, "v", "c", col("id").asc)
    }
    assert(e.getMessage.contains("integral"))
  }
}
