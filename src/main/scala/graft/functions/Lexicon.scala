package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native lexicon kernels: token-array scans against a plan-constant
  * word table. The HOF spellings (`filter(toks, _.isin(...))` for
  * marker counts; an `aggregate` fold over `element_at(map_literal)`
  * for the surprisal sum) are interpreted per-element closures — the
  * language-ID/quality gates and the LM scorer run them over EVERY
  * token of EVERY document, which is exactly the hot loop the other
  * kernels in this package eliminate. The tables ride into generated
  * code as reference objects (like PqExpressions' codebooks); HOF
  * spellings remain in graft.ops.TextOps / graft.queries.Text as the
  * differential references.
  */
object LexiconKernel {
  def count(toks: ArrayData, set: java.util.HashSet[UTF8String]): Int = {
    val n = toks.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i) && set.contains(toks.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  /** Σ table(token) with `default` for misses — the integer-millinat
    * surprisal sum (order-free by integrality). */
  def sum(toks: ArrayData, table: java.util.HashMap[UTF8String, java.lang.Long],
          default: Long): Long = {
    val n = toks.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val v = table.get(toks.getUTF8String(i))
        s += (if (v == null) default else v.longValue())
      }
      i += 1
    }
    s
  }
}

/** marker_count(toks): int — tokens drawn from a literal marker set. */
case class MarkerCount(child: Expression, markers: Seq[String])
    extends UnaryExpression {

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](markers.size * 2)
    markers.foreach(m => s.add(UTF8String.fromString(m)))
    s
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "marker_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    LexiconKernel.count(input.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("markerSet", set, "java.util.HashSet")
    defineCodeGen(ctx, ev, c => s"graft.functions.LexiconKernel.count($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** lexicon_sum(toks): bigint — Σ table(token), default for misses. */
case class LexiconSum(child: Expression, table: Map[String, Long], default: Long)
    extends UnaryExpression {

  @transient private lazy val map: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](table.size * 2)
    table.foreach { case (k, v) => m.put(UTF8String.fromString(k), v) }
    m
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "lexicon_sum"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    LexiconKernel.sum(input.asInstanceOf[ArrayData], map, default)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lexicon", map, "java.util.HashMap")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.LexiconKernel.sum($c, $ref, ${default}L)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LexiconFunctions {
  def marker_count(toks: Column, markers: Seq[String]): Column =
    GraftSqlBridge.column(MarkerCount(GraftSqlBridge.expression(toks), markers))

  def lexicon_sum(toks: Column, table: Map[String, Long], default: Long): Column =
    GraftSqlBridge.column(
      LexiconSum(GraftSqlBridge.expression(toks), table, default))
}
