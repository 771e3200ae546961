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
}
