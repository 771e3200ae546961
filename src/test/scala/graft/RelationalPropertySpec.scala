package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Differential properties for the relational core (SURVEY.md §5.3-5
  * beyond the MapReduce ABI): random small relations through Spark
  * groupBy/join/set-ops must equal a naive Scala-collections model —
  * the mrsequential-oracle idea applied to the relational surface.
  */
class RelationalPropertySpec extends SparkSuite {
  import spark.implicits._

  private val genRel: Gen[List[(Int, Int)]] =
    Gen.listOfN(40, Gen.zip(Gen.choose(0, 6), Gen.choose(-50, 50)))

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(6), p)
    assert(res.passed, res.status.toString)
  }

  test("groupBy agg (sum/count/min/max) equals collections model") {
    check(Prop.forAll(genRel) { rows =>
      rows.isEmpty || {
        val got = rows.toDF("k", "v").groupBy("k")
          .agg(org.apache.spark.sql.functions.sum("v"),
            org.apache.spark.sql.functions.count("v"),
            org.apache.spark.sql.functions.min("v"),
            org.apache.spark.sql.functions.max("v"))
          .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3), r.getInt(4)))).toMap
        val want = rows.groupBy(_._1).map { case (k, g) =>
          val vs = g.map(_._2)
          k -> ((vs.map(_.toLong).sum, vs.length.toLong, vs.min, vs.max))
        }
        got == want
      }
    })
  }

  test("inner equi-join equals nested-loop model (multiset)") {
    check(Prop.forAll(Gen.zip(genRel, genRel)) { case (l, r) =>
      val got = l.toDF("k", "a").join(r.toDF("k", "b"), "k")
        .collect().map(x => (x.getInt(0), x.getInt(1), x.getInt(2)))
        .groupBy(identity).view.mapValues(_.length).toMap
      val want = (for { (lk, a) <- l; (rk, b) <- r if lk == rk } yield (lk, a, b))
        .groupBy(identity).view.mapValues(_.length).toMap
      got == want
    })
  }

  test("exceptAll / intersectAll multiset semantics equal the model") {
    check(Prop.forAll(Gen.zip(genRel, genRel)) { case (l, r) =>
      def bag(s: Seq[(Int, Int)]) = s.groupBy(identity).view.mapValues(_.length).toMap
      val (lb, rb) = (bag(l), bag(r))
      val wantExcept = lb.map { case (k, n) => k -> (n - rb.getOrElse(k, 0)) }.filter(_._2 > 0)
      val wantIntersect = lb.flatMap { case (k, n) =>
        val m = math.min(n, rb.getOrElse(k, 0)); if (m > 0) Some(k -> m) else None
      }
      val gotExcept = bag(l.toDF("k", "v").exceptAll(r.toDF("k", "v"))
        .collect().toSeq.map(x => (x.getInt(0), x.getInt(1))))
      val gotIntersect = bag(l.toDF("k", "v").intersectAll(r.toDF("k", "v"))
        .collect().toSeq.map(x => (x.getInt(0), x.getInt(1))))
      gotExcept == wantExcept && gotIntersect == wantIntersect.toMap
    })
  }
}
