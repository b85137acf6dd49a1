package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native n-gram repetition kernel (extension tier (b) of the build
  * brief): BOTH Gopher-rule counters of an n-gram array — the
  * occurrence count of the most frequent element and the number of
  * positions belonging to any repeated element — in one sort + one
  * run-length pass.
  *
  * Why: the HOF formulation (array_sort + an `aggregate` run-length
  * fold + a `filter` over `sequence` comparing sorted neighbors, kept
  * in graft.queries.Text as the differential reference) is three
  * interpreted lambda passes per document — `aggregate`/`filter` are
  * CodegenFallback, and on 2000-token production documents the
  * per-element closure dispatch dominates the scan. This kernel sorts
  * the UTF8String array once (binary order — ANY total order yields
  * the same equal-adjacent runs) and folds both counters in a single
  * JIT-compiled loop, staying inside whole-stage codegen like
  * [[MinHashKernel]].
  */
object RunStatsKernel {
  private val Space = UTF8String.fromString(" ")

  /** (max_run, dup_positions) of the equal-element runs of the
    * k-gram array derived from `toks` (k=1: the elements themselves;
    * k>1: space-joined k-grams, the [[graft.ops.TextOps.shingles]]
    * construction fused into the kernel so the scan pays no
    * interpreted `transform` pass). Null elements are skipped for
    * k=1 (matching the HOF filter) and ignored inside a gram for k>1
    * (matching concat_ws); null when no gram exists. */
  def stats(toks: ArrayData, k: Int): InternalRow = {
    val n = toks.numElements()
    val arr =
      if (k == 1) {
        val a = new Array[UTF8String](n)
        var m = 0
        var i = 0
        while (i < n) {
          if (!toks.isNullAt(i)) { a(m) = toks.getUTF8String(i); m += 1 }
          i += 1
        }
        java.util.Arrays.copyOf(a, m)
      } else if (n < k) Array.empty[UTF8String]
      else {
        val parts = new Array[UTF8String](n)
        var i = 0
        while (i < n) {
          parts(i) = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
          i += 1
        }
        Array.tabulate(n - k + 1)(i =>
          UTF8String.concatWs(Space, java.util.Arrays.copyOfRange(parts, i, i + k): _*))
      }
    val m = arr.length
    if (m == 0) return null
    java.util.Arrays.sort(arr.asInstanceOf[Array[Object]], 0, m)
    var best = 1L
    var run = 1L
    var dups = 0L
    var j = 1
    while (j < m) {
      if (arr(j).equals(arr(j - 1))) run += 1
      else {
        if (run > 1) dups += run
        if (run > best) best = run
        run = 1
      }
      j += 1
    }
    if (run > 1) dups += run
    if (run > best) best = run
    new GenericInternalRow(Array[Any](best, dups))
  }
}

/** run_stats(toks[, k]): struct<max_run: bigint, dup_positions: bigint>
  * over the k-grams of an array<string> (k defaults to 1 — the
  * elements themselves). Codegen emits a single static call (no
  * CodegenFallback). */
case class RunStats(child: Expression, k: Int = 1) extends UnaryExpression {

  require(k >= 1, "run_stats requires k >= 1")

  override def dataType: DataType = StructType(Seq(
    StructField("max_run", LongType, nullable = false),
    StructField("dup_positions", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "run_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    RunStatsKernel.stats(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // the kernel returns null for an empty gram set even when the
    // child is non-null, so the generated code re-checks the result
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.RunStatsKernel.stats($c, $k);
       |${ev.isNull} = (${ev.value} == null);
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RunStatsFunctions {
  def run_stats(grams: Column): Column =
    GraftSqlBridge.column(RunStats(GraftSqlBridge.expression(grams)))

  /** Fused shingle construction + run stats: the whole q60 metric
    * family in one native call over the raw token array. */
  def ngram_run_stats(toks: Column, k: Int): Column =
    GraftSqlBridge.column(RunStats(GraftSqlBridge.expression(toks), k))
}
