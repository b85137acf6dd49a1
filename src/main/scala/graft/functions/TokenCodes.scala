package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

import java.security.MessageDigest

/** Native md5-prefix token-code kernels: the per-token
  * `conv(substring(md5(t), 1, hexChars), 16, 10)` spelling is an
  * interpreted `transform` lambda running a digest per element —
  * these fuse the digest into a JIT loop (same rationale as
  * [[SimHashDocKernel]]/[[MinHashKernel]]; the HOF spellings in
  * graft.ops.TextOps stay as the differential references).
  */
object TokenCodesKernel {
  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First `hexChars`·4 bits of md5(token) as a long per token; null
    * tokens map to null elements (transform parity). */
  def codes(toks: ArrayData, hexChars: Int): ArrayData = {
    val n = toks.numElements()
    val md = digests.get()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        md.reset()
        val d = md.digest(toks.getUTF8String(i).getBytes)
        var v = 0L
        var j = 0
        while (j < hexChars) {
          val b = d(j / 2) & 0xff
          val nibble = if (j % 2 == 0) b >> 4 else b & 0xf
          v = (v << 4) | nibble
          j += 1
        }
        out(i) = java.lang.Long.valueOf(v)
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** The Rabin-Karp rolling fingerprint over the 32-bit codes, fused:
    * h = Σ tᵢ·Bⁱ mod M folded left-to-right, one digest per token, no
    * intermediate code array. A null token poisons the fold to null —
    * the same semantics as the staged HOF spelling (null code → null
    * accumulator). */
  def rolling(toks: ArrayData, b: Long, m: Long): Any = {
    val n = toks.numElements()
    val md = digests.get()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (toks.isNullAt(i)) return null
      md.reset()
      val d = md.digest(toks.getUTF8String(i).getBytes)
      val x = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      acc = (acc * b + x) % m
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }
}

/** token_codes(toks, hexChars): array<long> of md5-prefix codes. */
case class TokenCodes(child: Expression, hexChars: Int) extends UnaryExpression {

  require(hexChars >= 1 && hexChars <= 15, "hexChars must be in [1, 15]")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "token_codes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    TokenCodesKernel.codes(input.asInstanceOf[ArrayData], hexChars)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenCodesKernel.codes($c, $hexChars)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** rolling_fingerprint(toks): bigint — the order-sensitive Rabin-Karp
  * fingerprint of the token sequence (constants from
  * [[graft.ops.TextOps]]). */
case class RollingFingerprint(child: Expression, b: Long, m: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "rolling_fingerprint"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    TokenCodesKernel.rolling(input.asInstanceOf[ArrayData], b, m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |Object ${ev.value}_o = graft.functions.TokenCodesKernel.rolling($c, ${b}L, ${m}L);
       |${ev.isNull} = (${ev.value}_o == null);
       |${ev.value} = ${ev.isNull} ? -1L : ((java.lang.Long) ${ev.value}_o).longValue();
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenCodesFunctions {
  def token_codes(toks: Column, hexChars: Int): Column =
    GraftSqlBridge.column(TokenCodes(GraftSqlBridge.expression(toks), hexChars))

  def rolling_fingerprint(toks: Column, b: Long, m: Long): Column =
    GraftSqlBridge.column(
      RollingFingerprint(GraftSqlBridge.expression(toks), b, m))
}
