package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

import java.security.MessageDigest

/** Native random-hyperplane LSH bucket code (extension tier (b)):
  * all `numPlanes` signed projections of an `array<double>` embedding
  * in ONE loop, returning the packed sign-bit bucket code.
  *
  * Why: the HOF formulation runs one `zip_with` + `aggregate` pass PER
  * PLANE, and — the real cost — evaluates `md5(plane:dim)` inside the
  * lambda, i.e. per row per element, even though the ±1 weight depends
  * only on (plane, dim). For a corpus scan that is 8 interpreted
  * passes and n·8 md5 digests per vector. This kernel memoizes the
  * weight table once per JVM (8 × dim bytes — the same table every row
  * uses) and accumulates all 8 plane sums in a single fused loop over
  * the vector: zero digests on the hot path, no intermediate arrays,
  * and the expression stays codegen-friendly (a single static call).
  *
  * Determinism contract (must match the DuckDB oracle spelling in
  * graft.queries.Similarity#signSql): weight(p, i) = +1 iff the first
  * hex char of md5("p:i") is 0-7 — i.e. iff the high nibble of the
  * first digest byte is < 8 — else -1; plane p contributes 1<<p to the
  * code iff Σᵢ v(i)·weight(p, i) > 0. Summation order is the same
  * left-to-right fold both engines use. Elements are assumed non-null
  * (dense embedding vectors, same contract as DotProduct/
  * CosineSimilarity — matching how embeddings parquet is written).
  */
object HyperplaneKernel {
  val NumPlanes = 8

  // weights(p)(i), grown on demand to the max dim seen; growth is
  // synchronized + copy-on-write so hot-path reads are lock-free
  @volatile private var table: Array[Array[Byte]] =
    Array.fill(NumPlanes)(Array.emptyByteArray)

  private def grow(dim: Int): Array[Array[Byte]] = synchronized {
    if (table(0).length >= dim) table
    else {
      val md = MessageDigest.getInstance("MD5")
      val next = Array.tabulate(NumPlanes) { p =>
        val row = new Array[Byte](dim)
        System.arraycopy(table(p), 0, row, 0, table(p).length)
        var i = table(p).length
        while (i < dim) {
          md.reset()
          val d = md.digest(s"$p:$i".getBytes("UTF-8"))
          row(i) = if (((d(0) & 0xf0) >>> 4) < 8) 1 else -1
          i += 1
        }
        row
      }
      table = next
      next
    }
  }

  /** Packed bucket code Σₚ (Σᵢ v(i)·w(p,i) > 0 ? 1<<p : 0). */
  def code(v: ArrayData): Long = {
    val n = v.numElements()
    var t = table
    if (t(0).length < n) t = grow(n)
    val sums = new Array[Double](NumPlanes)
    var i = 0
    while (i < n) {
      val x = v.getDouble(i)
      var p = 0
      while (p < NumPlanes) {
        sums(p) += x * t(p)(i)
        p += 1
      }
      i += 1
    }
    var codeBits = 0L
    var p = 0
    while (p < NumPlanes) {
      if (sums(p) > 0) codeBits |= (1L << p)
      p += 1
    }
    codeBits
  }
}

/** hyperplane_code(v): the packed 8-plane LSH bucket code as a long. */
case class HyperplaneCode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_code"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    HyperplaneKernel.code(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HyperplaneKernel.code($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneFunctions {
  def hyperplane_code(v: Column): Column =
    GraftSqlBridge.column(HyperplaneCode(GraftSqlBridge.expression(v)))
}
