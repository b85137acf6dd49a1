package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-order (Morton) curve kernel: interleaves the low 16 bits of two
  * dimensions into one 32-bit curve position. Sorting/range-
  * partitioning by the curve position co-locates rows that are close
  * in BOTH dimensions, so per-file min/max statistics stay narrow on
  * both columns and scans filtering on either dimension prune files —
  * the standard multi-dimensional data-layout trick (Delta/Iceberg
  * OPTIMIZE ZORDER) re-expressed as a native codegen expression.
  *
  * The bit-spread uses the classic mask ladder (shift-or then mask at
  * halving strides); the per-bit arithmetic spelling lives in the
  * oracle SQL and the differential spec.
  */
object ZOrderKernel {
  /** Spread the low 16 bits of v so bit i lands at position 2i. */
  def spread16(v: Long): Long = {
    var x = v & 0xffffL
    x = (x | (x << 8)) & 0x00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0fL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  /** Interleave x (even bit positions) and y (odd): a 32-bit Morton
    * code as a non-negative long. */
  def interleave16(x: Long, y: Long): Long =
    spread16(x) | (spread16(y) << 1)
}

/** zorder2(x, y): bigint Morton code of the two dims' low 16 bits. */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "zorder2"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, bigint), got (${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(x: Any, y: Any): Any =
    ZOrderKernel.interleave16(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (x, y) => s"graft.functions.ZOrderKernel.interleave16($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZOrderFunctions {
  def zorder2(x: Column, y: Column): Column =
    GraftSqlBridge.column(
      ZOrder2(GraftSqlBridge.expression(x), GraftSqlBridge.expression(y)))

  /** The mask-ladder spelling as SQL text (DuckDB + Spark SQL share
    * the operator set) — the oracle-side twin of [[ZOrderKernel]].
    * Text grows 16× the base expression; fine for column references,
    * which is all the layout queries feed it. */
  def spreadSql(v: String): String = {
    val m = s"($v & 65535)"
    val a = s"(($m | ($m << 8)) & 16711935)"
    val b = s"(($a | ($a << 4)) & 252645135)"
    val c = s"(($b | ($b << 2)) & 858993459)"
    s"(($c | ($c << 1)) & 1431655765)"
  }

  def zorderSql(x: String, y: String): String =
    s"(${spreadSql(x)} | (${spreadSql(y)} << 1))"
}
