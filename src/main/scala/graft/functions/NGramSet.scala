package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native distinct-k-gram kernel: the space-joined k-grams of a token
  * array, deduplicated in first-occurrence order — exactly
  * `array_distinct(TextOps.shingles(toks, k))`, whose HOF `transform`
  * is an interpreted (CodegenFallback) pass per document. The shingle
  * SETS feed `array_intersect`-based verification (Jaccard, benchmark
  * contamination), so unlike [[MinHashKernel.bandsOfGrams]] the array
  * must materialize — this kernel just builds it in one JIT-compiled
  * pass that stays inside whole-stage codegen.
  */
object NGramSetKernel {
  private val Space = UTF8String.fromString(" ")

  /** ALL k-grams in order (non-distinct — `TextOps.shingles` parity,
    * one gram per start position): the positional-gram companion of
    * [[grams]], for consumers that need every occurrence (span
    * surgery's coverage arithmetic) rather than the set. Same
    * construction semantics (space-joined, null tokens skipped). */
  def gramList(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      parts(i) = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
      i += 1
    }
    val out = new Array[Any](n - k + 1)
    i = 0
    while (i <= n - k) {
      out(i) = UTF8String.concatWs(Space, java.util.Arrays.copyOfRange(parts, i, i + k): _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct k-grams in first-occurrence order (array_distinct
    * parity); empty array when fewer than k tokens (shingles()
    * parity: `array()`). Null tokens are skipped inside a gram
    * (concat_ws parity). */
  def grams(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      parts(i) = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
      i += 1
    }
    val set = new java.util.LinkedHashSet[UTF8String]((n - k + 1) * 2)
    i = 0
    while (i <= n - k) {
      set.add(UTF8String.concatWs(Space, java.util.Arrays.copyOfRange(parts, i, i + k): _*))
      i += 1
    }
    new GenericArrayData(set.toArray.asInstanceOf[Array[Any]])
  }
}

/** ngram_set(toks, k): array<string> of distinct space-joined k-grams. */
case class NGramSet(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1, "ngram_set requires k >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "ngram_set"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    NGramSetKernel.grams(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NGramSetKernel.grams($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ngram_list(toks, k): array<string> of ALL space-joined k-grams in
  * start-position order (TextOps.shingles parity). */
case class NGramList(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1, "ngram_list requires k >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "ngram_list"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    NGramSetKernel.gramList(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NGramSetKernel.gramList($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NGramSetFunctions {
  def ngram_set(toks: Column, k: Int): Column =
    GraftSqlBridge.column(NGramSet(GraftSqlBridge.expression(toks), k))

  def ngram_list(toks: Column, k: Int): Column =
    GraftSqlBridge.column(NGramList(GraftSqlBridge.expression(toks), k))

  def sorted_member_count(needles: Column, sortedHaystack: Column): Column =
    GraftSqlBridge.column(SortedMemberCount(
      GraftSqlBridge.expression(needles), GraftSqlBridge.expression(sortedHaystack)))
}

/** Membership-count kernel against a SORTED haystack: how many
  * elements of `needles` occur in `sortedHaystack` — equal to
  * `size(array_intersect(needles, haystack))` when `needles` is
  * distinct, but O(|needles|·log|haystack|) per row instead of
  * rebuilding a hash set of the whole haystack PER ROW (which is what
  * Spark's ArrayIntersect does: for a benchmark shingle array
  * broadcast to every corpus row, that is O(|bench|) hash inserts per
  * document — the dominant cost of the q49 contamination scan).
  * Precondition: haystack sorted ascending (array_sort), non-null
  * elements — it is built once per query by the benchmark aggregate.
  */
object SortedMemberCountKernel {
  def count(needles: ArrayData, sortedHaystack: ArrayData): Int = {
    val m = sortedHaystack.numElements()
    val n = needles.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!needles.isNullAt(i)) {
        val x = needles.getUTF8String(i)
        var lo = 0
        var hi = m - 1
        var found = false
        while (lo <= hi && !found) {
          val mid = (lo + hi) >>> 1
          val cmp = sortedHaystack.getUTF8String(mid).compareTo(x)
          if (cmp == 0) found = true
          else if (cmp < 0) lo = mid + 1
          else hi = mid - 1
        }
        if (found) c += 1
      }
      i += 1
    }
    c
  }
}

/** sorted_member_count(needles, sorted_haystack): int. */
case class SortedMemberCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "sorted_member_count"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<string> arguments, got " +
          s"${l.simpleString} and ${r.simpleString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedMemberCountKernel.count(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SortedMemberCountKernel.count($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
