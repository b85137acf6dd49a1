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

object NGramSetFunctions {
  def ngram_set(toks: Column, k: Int): Column =
    GraftSqlBridge.column(NGramSet(GraftSqlBridge.expression(toks), k))
}
