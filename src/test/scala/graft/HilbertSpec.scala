package graft

import org.apache.spark.sql.functions._
import graft.functions.HilbertValue
import graft.queries.Sharding

/** Hilbert index invariants: bijection on the grid, the defining
  * unit-step adjacency of the traversal, xy2d/d2xy round-trip,
  * codegen'd expression ≡ kernel, and the aligned-subsquare bucket
  * bound of the registered layout query.
  */
class HilbertSpec extends SparkSuite {

  test("bijection + unit-step adjacency + round-trip on a 32x32 grid") {
    val bits = 5
    val n = 1 << bits
    val ds = for (x <- 0 until n; y <- 0 until n)
      yield HilbertValue.xy2d(bits, x, y)
    assert(ds.toSet === (0 until n * n).map(_.toLong).toSet) // bijection
    // walk the curve: consecutive indices are grid neighbors
    val cells = (0 until n * n).map(d => HilbertValue.d2xy(bits, d))
    cells.zip(cells.tail).foreach { case ((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1,
        s"non-adjacent step ($x1,$y1)->($x2,$y2)")
    }
    // round-trip
    (0 until n * n).foreach { d =>
      val (x, y) = HilbertValue.d2xy(bits, d)
      assert(HilbertValue.xy2d(bits, x, y) === d)
    }
  }

  test("full-width 16-bit round-trip on random points; index stays in [0, 2^32)") {
    val rnd = new scala.util.Random(20260813)
    (1 to 5000).foreach { _ =>
      val x = rnd.nextInt(1 << 16).toLong
      val y = rnd.nextInt(1 << 16).toLong
      val d = HilbertValue.xy2d(16, x, y)
      assert(d >= 0L && d < (1L << 32), s"($x,$y) -> $d out of range")
      assert(HilbertValue.d2xy(16, d) === ((x, y)), s"round-trip failed at ($x,$y)")
    }
  }

  test("hilbert_value expression under codegen ≡ kernel; null propagates; masks high bits") {
    import spark.implicits._
    HilbertValue.register(spark)
    val pts = Seq((3L, 5L), (65535L, 0L), (12345L, 54321L), (0L, 0L))
    val got = pts.toDF("x", "y")
      .select(call_function("hilbert_value", col("x"), col("y")))
      .collect().map(_.getLong(0)).toSeq
    assert(got === pts.map { case (x, y) => HilbertValue.hilbert16(x, y) })
    val withNull = Seq((Some(3L), None: Option[Long])).toDF("x", "y")
      .select(call_function("hilbert_value", col("x"), col("y"))).collect()
    assert(withNull(0).isNullAt(0))
    assert(HilbertValue.hilbert16(65536L + 7L, 9L) === HilbertValue.hilbert16(7L, 9L))
  }

  test("every hilbert bucket is an aligned subsquare: bbox <= 1024 in both dimensions") {
    val rows = Sharding.hilbertBucket(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) - r.getLong(2) < 1024, s"cust range: $r")
      assert(r.getLong(5) - r.getLong(4) < 1024, s"day range: $r")
    }
  }
}
