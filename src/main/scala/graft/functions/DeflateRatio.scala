package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deflate (zlib level 6) compressed size of a string's UTF-8 bytes,
  * as a native codegen'd expression — the COMPRESSION-RATIO quality
  * signal (original/compressed bytes) the big pretraining curations
  * gate on: highly repetitive or templated text compresses far below
  * natural prose, and near-random token salad barely compresses at
  * all. A Scala UDF here would break whole-stage codegen in the
  * scan-side projection where the signal is computed; this kernel is
  * one static call.
  *
  * Determinism: the JDK's Deflater wraps the bundled zlib with a fixed
  * level and default strategy, so the same bytes always produce the
  * same compressed length on any JVM — the spec pins planted inputs.
  * (No DuckDB mirror exists — SQL has no deflate — so the consuming
  * query is spec-certified per SURVEY §2.4.)
  *
  * Scale: pure per-row map over the text column; zero shuffle. The
  * Deflater is allocated per call — deflate cost dominates and the
  * expression stays thread-safe under codegen without pinning
  * per-thread native state.
  */
object DeflateRatio {
  /** Compressed byte count of the UTF-8 bytes (zlib level 6). */
  def compressedSize(s: UTF8String): Int = {
    val bytes = s.getBytes
    val d = new Deflater(6)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  def sizeCol(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      DeflateSize(org.apache.spark.sql.GraftColumnBridge.expression(c)))
}

case class DeflateSize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"deflate_size expects string, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    DeflateRatio.compressedSize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.DeflateRatio.compressedSize($s);")

  override protected def withNewChildInternal(c: Expression): DeflateSize =
    copy(child = c)

  override def prettyName: String = "deflate_size"
}
