package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

import java.security.MessageDigest

/** Native per-document SimHash kernel: the packed 16-bit code from ONE
  * md5 per token and ONE pass over the token array. The HOF spelling
  * (an md5 `transform` + SIXTEEN `aggregate` folds, one per bit — kept
  * in graft.queries.Dedup's q28 oracle and pinned equal in
  * SimHashDocSpec) is 17 interpreted passes per document; like
  * [[MinHashKernel]], the digest is the hot loop and this fuses all
  * bit votes into it. Per token, the value is the first 16 bits of
  * md5 (== `conv(substring(md5(t),1,4),16,10)`); bit b votes ±1 by
  * whether it is set; the code sets bit b where votes are positive.
  * Null tokens are skipped; null when the array is empty (q28 filters
  * those out — the guard keeps the expression total).
  */
object SimHashDocKernel {
  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  def code(toks: ArrayData): Any = {
    val n = toks.numElements()
    val votes = new Array[Int](16)
    val md = digests.get()
    var seen = false
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        seen = true
        md.reset()
        val d = md.digest(toks.getUTF8String(i).getBytes)
        val x = ((d(0) & 0xff) << 8) | (d(1) & 0xff)
        var b = 0
        while (b < 16) {
          if (((x >> b) & 1) == 1) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    if (!seen) return null
    var c = 0L
    var b = 0
    while (b < 16) {
      if (votes(b) > 0) c |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(c)
  }
}

/** simhash_doc(toks): bigint — the 16-bit SimHash of a token array. */
case class SimHashDoc(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash_doc"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    SimHashDocKernel.code(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // the kernel returns null for an empty/all-null array even when
    // the child is non-null, so the generated code re-checks (boxed
    // Long carries the nullability through codegen)
    nullSafeCodeGen(ctx, ev, c => s"""
       |Object ${ev.value}_o = graft.functions.SimHashDocKernel.code($c);
       |${ev.isNull} = (${ev.value}_o == null);
       |${ev.value} = ${ev.isNull} ? -1L : ((java.lang.Long) ${ev.value}_o).longValue();
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashDocFunctions {
  def simhash_doc(toks: Column): Column =
    GraftSqlBridge.column(SimHashDoc(GraftSqlBridge.expression(toks)))
}
