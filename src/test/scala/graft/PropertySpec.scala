package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.core.{KV, MapReduceJob}

/** Property-based differential tests (SURVEY.md §5.3-5): random
  * corpora through the MapReduce ABI must equal a naive
  * Scala-collections model — the mrsequential-oracle idea with
  * generated inputs instead of pg*.txt.
  */
/** Tokenizer lives outside the suite: closures shipped to executors
  * must not capture the (non-serializable) test-class instance.
  */
object PropertySpec extends Serializable {
  def tokens(text: String): Seq[String] =
    text.split("[^\\p{L}]+").toSeq.filter(_.nonEmpty)
}

class PropertySpec extends SparkSuite {
  import spark.implicits._

  private val words = Seq("alpha", "beta", "gamma", "delta", "x", "êtres")
  private val seps = Seq(" ", "  ", ", ", "; ", "\n", "-", "3", "42 ")

  private val genDoc: Gen[String] = for {
    n <- Gen.choose(0, 30)
    ws <- Gen.listOfN(n, Gen.oneOf(words))
    ss <- Gen.listOfN(n, Gen.oneOf(seps))
  } yield ws.zip(ss).map { case (w, s) => w + s }.mkString

  private val genCorpus: Gen[List[(String, String)]] = for {
    n <- Gen.choose(1, 6)
    docs <- Gen.listOfN(n, genDoc)
  } yield docs.zipWithIndex.map { case (t, i) => (f"d$i%03d", t) }

  import PropertySpec.tokens

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), p)
    assert(res.passed, res.status.toString)
  }

  test("MapReduceJob.run wc ≡ naive collections model (random corpora)") {
    check(Prop.forAll(genCorpus) { corpus =>
      val ds = corpus.toDF("key", "value").as[KV]
      val got = MapReduceJob.run(ds,
        mapf = (_, text) => tokens(text).map(w => KV(w, "1")),
        reducef = (_, vs) => vs.length.toString,
        nReduce = 3)
        .collect().map(kv => kv.key -> kv.value).toMap
      val model = corpus.flatMap(d => tokens(d._2))
        .groupBy(identity).map { case (w, os) => w -> os.length.toString }
      got == model
    })
  }

  test("runAssociative (combiner) ≡ run (final-only) on random corpora") {
    check(Prop.forAll(genCorpus) { corpus =>
      val ds = corpus.toDF("key", "value").as[KV]
      val mapf = (_: String, text: String) => tokens(text).map(w => KV(w, "1"))
      val a = MapReduceJob.runAssociative(ds, mapf,
        merge = (x, y) => (x.toLong + y.toLong).toString)
        .collect().map(kv => kv.key -> kv.value).toMap
      val b = MapReduceJob.run(ds, mapf,
        reducef = (_, vs) => vs.map(_.toLong).sum.toString)
        .collect().map(kv => kv.key -> kv.value).toMap
      a == b
    })
  }

  test("reduce sees every value exactly once, regardless of partitioning") {
    check(Prop.forAll(genCorpus, Gen.choose(1, 7)) { (corpus, r) =>
      val ds = corpus.toDF("key", "value").as[KV]
      // reducef that is order-insensitive but multiplicity-sensitive:
      // sorted concatenation of (doc,word) markers per word
      val got = MapReduceJob.run(ds,
        mapf = (doc, text) => tokens(text).map(w => KV(w, doc)),
        reducef = (_, vs) => vs.sorted.mkString(","),
        nReduce = r)
        .collect().map(kv => kv.key -> kv.value).toMap
      val model = corpus
        .flatMap { case (doc, text) => tokens(text).map(w => (w, doc)) }
        .groupBy(_._1).map { case (w, ps) => w -> ps.map(_._2).sorted.mkString(",") }
      got == model
    })
  }
}
