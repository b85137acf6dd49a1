package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native k-position hash family: position_j(key) = first md5 word of
  * ("j:" + key) mod M for j in 0..k-1 — the derivation shared by the
  * count-min sketch (q68 cell buckets) and the bloom filter (q73 bit
  * positions), identical to the composed Spark spelling
  * `conv(substring(md5(concat(lit(j+":"), key)), 1, 8), 16, 10) % M`
  * and the DuckDB `CAST('0x' || substr(md5(...), 1, 8) AS BIGINT) % M`.
  * One kernel call yields ALL k positions: the k digests are computed
  * in a single JIT-compiled pass with no hex-string materialization,
  * no string→long parse, and no per-j Column tree — the composed form
  * pays those k times per row in the probe scan.
  */
object HashPositionsKernel {
  /** "j:" prefixes precomputed for the small j this family uses. */
  private val prefixes: Array[Array[Byte]] =
    Array.tabulate(64)(j => s"$j:".getBytes("UTF-8"))

  def positions(key: UTF8String, k: Int, mod: Long): ArrayData = {
    // md5 plumbing shared with MinHashKernel (one copy of the
    // contract-critical byte-order arithmetic)
    val md = MinHashKernel.digests.get()
    val keyBytes = key.getBytes
    val out = new Array[Any](k)
    var j = 0
    while (j < k) {
      md.reset()
      md.update(prefixes(j))
      md.update(keyBytes)
      out(j) = MinHashKernel.word(md.digest(), 0) % mod
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** hash_positions(key, k, mod): array<long> of the k md5-family
  * positions of a string key. */
case class HashPositions(child: Expression, k: Int, mod: Long)
    extends UnaryExpression {

  require(k >= 1 && k <= 64, "hash_positions requires 1 <= k <= 64")
  require(mod > 0, "hash_positions requires mod > 0")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "hash_positions"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    HashPositionsKernel.positions(input.asInstanceOf[UTF8String], k, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashPositionsKernel.positions($c, $k, ${mod}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashPositionsFunctions {
  def hash_positions(key: Column, k: Int, mod: Long): Column =
    GraftSqlBridge.column(HashPositions(GraftSqlBridge.expression(key), k, mod))
}
