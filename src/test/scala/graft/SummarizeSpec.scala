package graft

import graft.queries.Summarize

/** summarize_extract contracts (the full rank arithmetic is
  * hash-gated against the independent DuckDB reimplementation —
  * rounds, graph and all): structural invariants plus a sequential
  * recompute of graph membership — every extracted chunk must
  * actually share ≥3 informative tokens with a sibling chunk.
  */
class SummarizeSpec extends SparkSuite {

  test("partition-local rounds equal Cluster.pagerankOf on the same graph") {
    import org.apache.spark.sql.functions._
    // rebuild the packed chunk graph exactly as the operator does
    val chunks = graft.core.Tables.documents(spark, sfDir)
      .select(col("doc_id"), graft.queries.Dedup.tokensCol(col("text")).as("ws"))
      .select(col("doc_id"), col("ws"), size(col("ws")).as("n"))
      .where(col("n") > 0)
      .select(col("doc_id"), col("ws"),
        explode(expr(s"sequence(0, (n - 1) DIV ${Summarize.ChunkLen})")).as("ci"))
      .select(col("doc_id"), col("ci"),
        array_distinct(filter(
          slice(col("ws"), col("ci") * Summarize.ChunkLen + 1, lit(Summarize.ChunkLen)),
          w => length(w) >= Summarize.MinTokLen)).as("ts"))
    val toks = chunks.select(col("doc_id"), col("ci"), explode(col("ts")).as("tk"))
    val edges = toks.as("a").join(toks.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.tk") === col("b.tk") &&
          col("a.ci") < col("b.ci"))
      .groupBy(col("a.doc_id").as("doc_id"), col("a.ci").as("ca"), col("b.ci").as("cb"))
      .agg(count(lit(1)).as("n")).filter(col("n") >= Summarize.MinShared)
      .select((col("doc_id") * 1024 + col("ca")).as("na"),
        (col("doc_id") * 1024 + col("cb")).as("nb"))
    val sym = edges.select(col("na").as("src"), col("nb").as("dst"))
      .union(edges.select(col("nb").as("src"), col("na").as("dst")))
    val shared = graft.queries.Cluster.pagerankOf(sym).collect()
      .map(r => (r.getLong(0) / 1024, r.getLong(0) % 1024) ->
        math.floor(r.getDouble(1) * 1000000 + 0.5)).toMap
    val local = Summarize.summarizeExtract(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        math.floor(r.getDouble(3) * 1000000 + 0.5)).toMap
    // every extracted chunk's rank agrees with the shared distributed
    // loop at the 6dp output precision
    local.foreach { case (k, v) =>
      assert(math.abs(shared(k) - v) <= 1, s"chunk $k rank $v vs shared ${shared(k)}")
    }
    assert(local.nonEmpty)
  }

  test("summarize_extract: top-2 per doc, members of the chunk graph, ranks sane") {
    val got = Summarize.summarizeExtract(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(got.nonEmpty)
    got.groupBy(_._1).foreach { case (doc, rows) =>
      val rks = rows.map(_._3).sorted.toSeq
      assert(rks == (1 to rows.length), s"doc $doc ranks not dense: $rks")
      assert(rows.length <= Summarize.TopK)
      // rk order agrees with (rank desc, chunk asc)
      val byRk = rows.sortBy(_._3).map(t => (t._4, t._2))
      assert(byRk.sliding(2).forall {
        case Array((r1, c1), (r2, c2)) => r1 > r2 || (r1 == r2 && c1 < c2)
        case _ => true
      }, s"doc $doc rank ordering")
    }
    assert(got.forall(t => t._4 > 0.0 && t._4 <= 1.0))
    // sequential graph membership: each selected chunk shares >= 3
    // distinct len>=3 tokens with some other chunk of its doc
    val chunksByDoc = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect().map { r =>
        val ws = "[^\\p{L}]+".r.split(r.getString(1)).filter(_.nonEmpty)
        r.getLong(0) -> ws.grouped(Summarize.ChunkLen)
          .map(_.filter(_.length >= Summarize.MinTokLen).toSet).toArray
      }.toMap
    got.foreach { case (doc, ci, _, _) =>
      val cs = chunksByDoc(doc)
      val mine = cs(ci.toInt)
      val partner = cs.indices.exists(j =>
        j != ci.toInt && (mine & cs(j)).size >= Summarize.MinShared)
      assert(partner, s"doc $doc chunk $ci has no qualifying sibling")
    }
  }

  test("node packing fails loudly past Pack chunks instead of colliding doc ids") {
    val sess = spark
    import sess.implicits._
    // 1026 chunks of 12 tokens — chunk index 1024+ would silently pack
    // into doc_id+1's node range without the guard. Six cycling words
    // make every chunk pair share >= MinShared distinct len>=3 tokens.
    val words = Seq("alpha", "bravo", "charlie", "delta", "echo", "foxtrot")
    val text = Seq.tabulate(1026 * Summarize.ChunkLen)(i =>
      words(i % words.length)).mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graft_pack").toString
    Seq((1L, text)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val e = intercept[Exception] {
      Summarize.summarizeExtract(spark, dir).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
        Option(c.getMessage).exists(_.contains("chunk index >= 1024"))),
      s"expected the overflow guard to fire, got: $e")
  }
}
