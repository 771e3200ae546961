package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho-Corasick multi-pattern matcher (Aho & Corasick '75) — the
  * scale path for blocklist screening that [[graft.queries.Blocklist]]
  * documents: ONE left-to-right pass over the text counts ALL
  * occurrences of EVERY pattern simultaneously (overlapping included),
  * instead of |patterns| separate scans. With production blocklists
  * (thousands of phrases) the per-term explode is |patterns|× the
  * corpus; this automaton is O(text + matches) regardless of list
  * size.
  *
  * The automaton is built once on the driver from the FIXED pattern
  * list, shipped to executors inside the expression (a codegen
  * reference object), and the kernel is one static-shaped virtual
  * call — whole-stage codegen keeps the scan→project pipeline fused
  * exactly like DeflateSize.
  */
final class AhoCorasick(val patterns: Seq[String]) extends Serializable {
  // an empty pattern would register its output on the root node and
  // "match" once per scanned character — reject at construction
  require(patterns.forall(_.nonEmpty),
    "AhoCorasick: empty-string patterns are not allowed")
  // dense trie in arrays; goto maps are per-node hash maps (pattern
  // alphabets are tiny relative to text) — built once, read-only after
  private val gotoMaps = scala.collection.mutable.ArrayBuffer(
    scala.collection.mutable.Map.empty[Char, Int])
  private val outLists = scala.collection.mutable.ArrayBuffer(List.empty[Int])
  patterns.zipWithIndex.foreach { case (p, pi) =>
    var node = 0
    p.foreach { ch =>
      node = gotoMaps(node).getOrElseUpdate(ch, {
        gotoMaps += scala.collection.mutable.Map.empty[Char, Int]
        outLists += Nil
        gotoMaps.length - 1
      })
    }
    outLists(node) = pi :: outLists(node)
  }
  private val fail = new Array[Int](gotoMaps.length)
  // BFS failure links; merge output sets along failures
  locally {
    val queue = scala.collection.mutable.Queue.empty[Int]
    gotoMaps(0).values.foreach { c => fail(c) = 0; queue += c }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      gotoMaps(u).foreach { case (ch, v) =>
        var f = fail(u)
        while (f != 0 && !gotoMaps(f).contains(ch)) f = fail(f)
        fail(v) = gotoMaps(f).get(ch).filter(_ != v).getOrElse(0)
        outLists(v) = outLists(v) ::: outLists(fail(v))
        queue += v
      }
    }
  }
  private val gotoArr: Array[Map[Char, Int]] = gotoMaps.map(_.toMap).toArray
  private val outArr: Array[Array[Int]] = outLists.map(_.toArray).toArray

  /** ALL-occurrence counts per pattern (overlapping included). */
  def counts(text: String): Array[Long] = {
    val res = new Array[Long](patterns.length)
    var node = 0
    var i = 0
    while (i < text.length) {
      val ch = text.charAt(i)
      while (node != 0 && !gotoArr(node).contains(ch)) node = fail(node)
      node = gotoArr(node).getOrElse(ch, 0)
      val out = outArr(node)
      var k = 0
      while (k < out.length) { res(out(k)) += 1L; k += 1 }
      i += 1
    }
    res
  }

  /** Codegen entry: UTF8String in, Catalyst array out. */
  def countsArray(s: UTF8String): ArrayData =
    new GenericArrayData(counts(s.toString))
}

object MultiMatch {
  def countsCol(c: Column, patterns: Seq[String]): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      MultiMatchCounts(
        org.apache.spark.sql.GraftColumnBridge.expression(c), patterns))
}

/** array<bigint> of all-occurrence match counts, index-aligned with
  * the fixed pattern list.
  */
case class MultiMatchCounts(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  @transient private lazy val ac = new AhoCorasick(patterns)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"multi_match_counts expects string, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    ac.countsArray(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("ac", ac, classOf[AhoCorasick].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $acRef.countsArray($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): MultiMatchCounts =
    copy(child = newChild)
}
