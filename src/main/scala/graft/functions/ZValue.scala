package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Morton (Z-order) interleave of two non-negative long keys,
  * 31 bits each → a 62-bit z-value (the full 2-D budget of a signed
  * long — covers keys to 2.1×10⁹ per dimension, e.g. TPC-H custkey
  * past sf10000), with full whole-stage-codegen support.
  *
  * Z-ordering is the multi-dimensional data-LAYOUT optimizer: sorting
  * a table by z(x, y) before writing makes file/row-group min-max
  * ranges tight in BOTH dimensions at once, so predicate pushdown on
  * either column prunes most of the files — the standard lakehouse
  * technique for two-column scan selectivity at 100 TB (a single-column
  * sort gives pruning on that column only).
  *
  * Bit spreading uses the constant-time magic-mask sequence rather
  * than a 31-iteration loop; the semantics are exactly
  * Σ_i ((x>>i)&1)<<2i | ((y>>i)&1)<<(2i+1), which is what the DuckDB
  * oracle computes with an explicit bit loop (hash-gate compatible)
  * and what ZorderSpec's sequential reference asserts bit-for-bit.
  * Inputs are masked to their low 31 bits; null if either side is
  * null (standard binary-expression null propagation).
  */
case class ZValue(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (LongType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"z_value expects (bigint, bigint), got " +
            s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    ZValue.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ZValue.interleave($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZValue =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "z_value"
}

object ZValue {
  /** Spread the low 31 bits of v so bit i lands at position 2i. */
  def spread(v: Long): Long = {
    var x = v & 0x7FFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** x bits at even positions, y bits at odd — the 62-bit z-value. */
  def interleave(x: Long, y: Long): Long =
    spread(x) | (spread(y) << 1)

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "z_value",
      exprs => ZValue(exprs.head, exprs(1)),
      "built-in")
}
