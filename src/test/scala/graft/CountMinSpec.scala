package graft

import org.apache.spark.sql.functions._
import graft.functions.{CountMinAggregator, CountMinUtil}
import graft.queries.Sketches

/** Count-Min sketch contracts: never undercounts, merge across
  * partitions ≡ single-pass grid, overcount within the ε·n design
  * bound, and the registered cms_freq audit query (estimate >= exact,
  * probes = exact top-20).
  */
class CountMinSpec extends SparkSuite {

  private val Depth = 4
  private val Width = 256

  private def buildGrid(hashes: Seq[Long], parts: Int): Array[Long] = {
    import spark.implicits._
    spark.createDataset(hashes).repartition(parts)
      .select(CountMinAggregator.sketch(Depth, Width)).head()
  }

  test("estimate never undercounts; zipfian overcount within eps*n") {
    val rnd = new scala.util.Random(7)
    // zipf-ish stream: key k appears ~ 2000/k times
    val keys = (1 to 200).flatMap(k => Seq.fill(2000 / k)(k.toLong))
    val stream = rnd.shuffle(keys)
    val hash = (k: Long) => graft.functions.BloomFilterUtil.fmix64(k)
    val grid = buildGrid(stream.map(hash), parts = 4)
    val exact = stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val n = stream.size.toLong
    val epsN = math.ceil(math.E / Width * n).toLong
    var violations = 0
    exact.foreach { case (k, c) =>
      val est = CountMinUtil.estimate(grid, Depth, Width, hash(k))
      assert(est >= c, s"CMS undercounted key $k: est $est < true $c")
      if (est - c > epsN) violations += 1
    }
    // P(over > eps*n) <= e^-depth per key; allow a loose margin
    assert(violations <= math.max(2, exact.size / 10),
      s"$violations/${exact.size} keys exceeded the eps*n overcount bound")
  }

  test("merge across partition counts equals single-partition grid") {
    val rnd = new scala.util.Random(42)
    val hashes = Seq.fill(5000)(rnd.nextLong())
    val a = buildGrid(hashes, parts = 1)
    val b = buildGrid(hashes, parts = 7)
    assert(java.util.Arrays.equals(a, b),
      "elementwise-sum merge must be partitioning-independent")
    // total mass per row = n
    (0 until Depth).foreach { r =>
      assert(a.slice(r * Width, (r + 1) * Width).sum === hashes.size.toLong)
    }
  }

  test("cms_freq: 20 probes, estimates never undercount, grid bound holds") {
    val rows = Sketches.cmsFreq(spark, sfDir).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      val exact = r.getLong(1); val est = r.getLong(2); val over = r.getLong(3)
      assert(est >= exact, s"undercount for ${r.getString(0)}")
      assert(over === est - exact)
    }
    // heavy head should be estimated tightly at this scale: median
    // overcount well under the heaviest token's count
    val overs = rows.map(_.getLong(3)).sorted
    val maxExact = rows.map(_.getLong(1)).max
    assert(overs(rows.length / 2) < maxExact,
      "median CMS overcount should be far below the head counts")
  }
}
