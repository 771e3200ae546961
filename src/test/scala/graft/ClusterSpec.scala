package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.queries.{Cluster, Dedup}

/** Connected components vs a local union-find model: fixed shapes
  * (cliques, a long path exercising multi-round convergence, isolated
  * pairs, cycles) plus ScalaCheck random graphs; and the end-to-end
  * dedup_cluster consistency with the MinHash candidate producer.
  */
class ClusterSpec extends SparkSuite {
  import spark.implicits._

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    edges.flatMap(e => Seq(e._1, e._2)).distinct.map(n => n -> find(n)).toMap
  }

  private def ccOf(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Cluster.connectedComponents(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def ccStarOf(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Cluster.connectedComponentsLogStar(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("cliques, cycles, and isolated pairs get min-id cluster labels") {
    val edges = Seq[(Long, Long)](
      (1, 2), (2, 3), (3, 1),      // triangle  -> 1
      (10, 11),                    // pair      -> 10
      (20, 21), (21, 22), (22, 20), (20, 22), // cycle + dup edge -> 20
      (30, 31), (31, 32), (30, 32))
    assert(ccOf(edges) === unionFind(edges))
  }

  test("long path converges past many propagation rounds") {
    // Path 0-1-2-...-40: min-label needs ~diameter rounds; all nodes -> 0.
    val edges = (0L until 40L).map(i => (i, i + 1))
    val got = ccOf(edges)
    assert(got.size === 41 && got.values.forall(_ === 0L))
  }

  test("random graphs match union-find (ScalaCheck)") {
    val genEdges = Gen.listOfN(60,
      Gen.zip(Gen.choose(0L, 29L), Gen.choose(0L, 29L)).suchThat(e => e._1 != e._2))
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8),
      Prop.forAll(genEdges) { edges =>
        edges.isEmpty || ccOf(edges) == unionFind(edges)
      })
    assert(res.passed, res.status.toString)
  }

  test("logStar variant: cliques, cycles, pairs, self-loop-only input") {
    val edges = Seq[(Long, Long)](
      (1, 2), (2, 3), (3, 1), (10, 11),
      (20, 21), (21, 22), (22, 20), (20, 22),
      (30, 31), (31, 32), (30, 32))
    assert(ccStarOf(edges) === unionFind(edges))
  }

  test("logStar converges on a deep path in O(log n) rounds") {
    // Path 0-..-60: diameter 60 >> maxIter 25 — only the star-contract
    // algorithm can finish inside the round budget.
    val edges = (0L until 60L).map(i => (i, i + 1))
    val got = ccStarOf(edges)
    assert(got.size === 61 && got.values.forall(_ === 0L))
  }

  test("logStar random graphs match union-find and label propagation (ScalaCheck)") {
    val genEdges = Gen.listOfN(50,
      Gen.zip(Gen.choose(0L, 24L), Gen.choose(0L, 24L)).suchThat(e => e._1 != e._2))
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8),
      Prop.forAll(genEdges) { edges =>
        edges.isEmpty || {
          val uf = unionFind(edges)
          ccStarOf(edges) == uf && ccOf(edges) == uf
        }
      })
    assert(res.passed, res.status.toString)
  }

  test("dedup_cluster groups the sf0.001 corpus consistently with edges") {
    val out = Cluster.dedupCluster(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty, "expected at least one near-dup cluster in testdata")
    // cluster_id is the min member; n_docs consistent with the grouping
    val byCluster = out.groupBy(_._2)
    byCluster.foreach { case (cid, ms) =>
      assert(ms.map(_._1).min === cid)
      assert(ms.forall(_._3 === ms.length.toLong))
    }
    // must equal union-find over the same threshold edges
    val edges = Dedup.ngramScored(graft.core.Tables.documents(spark, sfDir))
      .filter(col("jac") >= 0.6)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSeq
    assert(out.map(t => t._1 -> t._2).toMap === unionFind(edges))
  }
}
