package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.SparkEntry

/** WALL-CLOCK scale evidence on real ON-DISK datasets (dev tool) —
  * the round-11 verdict's gap #3: the ×10 curves measured per-stage
  * ROW growth on in-memory replications; this measures elapsed
  * SECONDS for the headline linear operators against materialized
  * parquet at ×1 / ×10 / ×100 of sf0.1, where parquet scan, shuffle
  * and memory pressure are real.
  *
  * Dataset construction (written once per factor under the work
  * root): copy c of the corpus remaps ids (`doc_id + c·10⁷`) and tags
  * every whitespace word with a letter-only copy suffix (the
  * tokenizer splits on non-letter runs, so a digit/underscore tag
  * would vanish — letters survive), making copies token-disjoint:
  * NO cross-copy near-dups, so each copy carries exactly the base
  * corpus's duplicate structure and every dedup family's true output
  * (and candidate volume) scales LINEARLY with the factor — the
  * property the 100 TB design claims and this tool exists to time.
  * A naive exact replication would instead create k-clique duplicate
  * groups (k(k−1)/2 pair blowup — quadratic in the factor) and
  * measure a workload the design explicitly avoids. Embeddings
  * replicate as-is (cell populations scale uniformly; trainers are
  * sample-capped so only assignment/serving grows).
  *
  * Usage: sbt "Test/runMain graft.tools.WallScale [factors] [workRoot]"
  * (defaults "1,10,100" /tmp/graft_wallscale). Prints one line per
  * (factor, op): rows, wall seconds, and the ratio vs that op's ×1
  * time — the number to paste into BASELINE.md.
  */
object WallScale {
  val Base = "/root/testdata/sf0.1"
  // headline linear-path operators over documents/embeddings/orders/
  // events; the tfidf pair times the quadratic-oracle form against
  // its banded weighted-SimHash scale twin on the same data, and the
  // last three (round-13 verdict #8, extended #6 in r14) time the
  // ScalableRank two-pass total-order rewrites — the ranks/ntiles
  // that were single-partition windows before round 13 and would have
  // serialized on one core here (user_rfm was the most regressed r13
  // conversion; its curve pins the grouped two-pass form)
  val Ops: Seq[String] = Seq("dedup_exact", "dedup_minhash",
    "dedup_keep_minhash", "quality_score", "lm_score", "ann_ivf",
    "dedup_tfidf", "dedup_tfidf_simhash", "classifier_auc", "zorder_eval",
    "user_rfm")

  private def tag(c: Int): String = {
    // letter-only base-26 copy tag ("zaa", "zab", …)
    val a = ('a' + c / 26).toChar; val b = ('a' + c % 26).toChar
    s"z$a$b"
  }

  def writeFactor(s: SparkSession, root: String, k: Int): String = {
    val dir = s"$root/x$k"
    val docs = s.read.parquet(s"$Base/documents.parquet")
    val embs = s.read.parquet(s"$Base/embeddings.parquet")
    val dcopies = (0 until k).map { c =>
      docs.select(
        (col("doc_id") + lit(c * 10000000L)).as("doc_id"),
        array_join(transform(split(col("text"), " "),
          w => concat(lit(tag(c)), w)), " ").as("text"),
        col("lang"), col("source"))
    }
    dcopies.reduce(_ unionAll _)
      .withColumn("n_chars", length(col("text")))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val ecopies = (0 until k).map { c =>
      embs.select((col("vec_id") + lit(c * 10000000L)).as("vec_id"),
        col("embedding"), col("label"))
    }
    ecopies.reduce(_ unionAll _).repartition(32)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // orders for zorder_eval: key remapped per copy, layout dimensions
    // (custkey, orderdate) kept — the sort/ntile input scales linearly
    val ords = s.read.parquet(s"$Base/orders.parquet")
    (0 until k).map { c =>
      ords.withColumn("o_orderkey", col("o_orderkey") + lit(c * 100000000L))
    }.reduce(_ unionAll _).repartition(32)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // events for user_rfm: user_id remapped per copy (ts/type/value
    // kept), so the purchasing-user population — the rank/NTILE input
    // — scales linearly with per-user structure intact. Read via
    // Tables.events (ts normalizes to epoch-nanos long; the copies
    // write LongType, which Tables.events passes through).
    val evs = graft.core.Tables.events(s, Base)
    (0 until k).map { c =>
      evs.withColumn("user_id", col("user_id") + lit(c * 10000000L))
    }.reduce(_ unionAll _).repartition(32)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  def main(args: Array[String]): Unit = {
    val factors = args.headOption.getOrElse("1,10,100")
      .split(",").map(_.trim.toInt).toSeq
    val root = args.drop(1).headOption.getOrElse("/tmp/graft_wallscale")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the shared Bench sweep (exempts live ModelCache-backed blocks —
    // required the moment a serve entry joins Ops)
    def clean(): Unit = graft.core.ModelCache.sweepLeakedBlocks(spark)
    // JIT/codegen warm-up on the untouched base dir so ×1 is steady state
    Ops.foreach { op =>
      SparkEntry.queries(op)(spark, Base).count(); clean()
    }
    val x1 = scala.collection.mutable.Map.empty[String, Double]
    factors.foreach { k =>
      val t0 = System.nanoTime()
      val dir = writeFactor(spark, root, k)
      println(f"[wall-scale] x$k%-3d generated in ${(System.nanoTime() - t0) / 1e9}%.1f s")
      Ops.foreach { op =>
        val t1 = System.nanoTime()
        val rows = SparkEntry.queries(op)(spark, dir).count()
        val sec = (System.nanoTime() - t1) / 1e9
        clean()
        // baseline = the FIRST factor processed (not factors.min, which
        // records nothing until reached when the list is unordered)
        if (!x1.contains(op)) x1(op) = sec
        val ratio = x1.get(op).map(b => f"${sec / b}%.1f").getOrElse("-")
        println(f"[wall-scale] x$k%-3d $op%-20s rows=$rows%-9d wall=$sec%7.2f s  vs_x1=$ratio")
      }
    }
    spark.stop()
  }
}
