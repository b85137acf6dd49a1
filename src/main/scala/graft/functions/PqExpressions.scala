package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native product-quantization kernels (extension tier (b), same
  * rationale as MinHashBands/HyperplaneCode): the Column-level PQ
  * spelling unrolls M×K×subDim (= 1024 at 8×16×8) squared-difference
  * terms into one projection — past janino's method limit, so
  * whole-stage codegen FAILS and the scan runs interpreted (measured:
  * a logged CodeGenerator error + fallback on the q58/q59 plans).
  * These kernels do the same arithmetic in one fused loop behind a
  * single static call, keeping the corpus scan inside codegen.
  *
  * Determinism contract (must match the DuckDB oracle spelling in
  * graft.queries.Similarity#q58Sql/q59Sql): per-subspace distance is
  * the ascending-i left-to-right fold of (v[off+i]-c[i])²; argmin
  * keeps the FIRST minimal code (strict <), matching
  * `ORDER BY d ASC, cid ASC`. The codebook rides into generated code
  * as a reference object — it is trained per corpus, not a JVM-wide
  * constant like the hyperplane table.
  */
object PqKernel {

  /** A vector shorter than the codebook's M×subDim would read past the
    * array (silently, for UnsafeArrayData with assertions off) — fail
    * loud instead; undefined on the oracle side too, so there is no
    * "right answer" to return. */
  private def requireDim(v: ArrayData, books: Array[Array[Array[Double]]]): Unit = {
    val need = books.length * books(0)(0).length
    if (v.numElements() < need)
      throw new IllegalArgumentException(
        s"pq kernel: vector has ${v.numElements()} dims, codebook needs $need")
  }

  private def dist2(v: ArrayData, off: Int, c: Array[Double]): Double = {
    var d = 0.0
    var i = 0
    while (i < c.length) {
      val diff = v.getDouble(off + i) - c(i)
      d += diff * diff
      i += 1
    }
    d
  }

  /** Per-subspace (code, dist) structs: code = argmin dist², dist =
    * that minimum. */
  def encode(v: ArrayData, books: Array[Array[Array[Double]]]): ArrayData = {
    requireDim(v, books)
    val out = new Array[Any](books.length)
    var off = 0
    var s = 0
    while (s < books.length) {
      val book = books(s)
      var bestK = 0
      var bestD = Double.PositiveInfinity
      var k = 0
      while (k < book.length) {
        val d = dist2(v, off, book(k))
        if (d < bestD) { bestD = d; bestK = k }
        k += 1
      }
      out(s) = InternalRow(bestK, bestD)
      off += book(0).length
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Per-subspace ADC lookup tables: tables(s)(k) = dist²(subvec_s,
    * books(s)(k)) — built once per QUERY row, then each candidate
    * costs M lookups instead of D multiply-adds. */
  def distTable(v: ArrayData, books: Array[Array[Array[Double]]]): ArrayData = {
    requireDim(v, books)
    val out = new Array[Any](books.length)
    var off = 0
    var s = 0
    while (s < books.length) {
      val book = books(s)
      val row = new Array[Double](book.length)
      var k = 0
      while (k < book.length) {
        row(k) = dist2(v, off, book(k))
        k += 1
      }
      out(s) = new GenericArrayData(row)
      off += book(0).length
      s += 1
    }
    new GenericArrayData(out)
  }
}

private[functions] trait PqExpression extends UnaryExpression {
  def books: Array[Array[Array[Double]]]

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${t.simpleString}")
  }

  protected def kernelCall(ctx: CodegenContext, c: String): String = {
    val ref = ctx.addReferenceObj("pqBooks", books, "double[][][]")
    s"graft.functions.PqKernel.$kernelName($c, $ref)"
  }
  protected def kernelName: String
}

/** pq_encode(v): array<struct<code int, dist double>>, one entry per
  * subspace. */
case class PqEncode(child: Expression, books: Array[Array[Array[Double]]])
    extends PqExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("code", IntegerType, nullable = false),
      StructField("dist", DoubleType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "pq_encode"
  override protected def kernelName: String = "encode"

  override def nullSafeEval(input: Any): Any =
    PqKernel.encode(input.asInstanceOf[ArrayData], books)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => kernelCall(ctx, c))
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** pq_dist_table(v): array<array<double>> — the M×K ADC lookup table. */
case class PqDistTable(child: Expression, books: Array[Array[Array[Double]]])
    extends PqExpression {
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def prettyName: String = "pq_dist_table"
  override protected def kernelName: String = "distTable"

  override def nullSafeEval(input: Any): Any =
    PqKernel.distTable(input.asInstanceOf[ArrayData], books)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => kernelCall(ctx, c))
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqFunctions {
  def pq_encode(v: Column, books: Array[Array[Array[Double]]]): Column =
    GraftSqlBridge.column(PqEncode(GraftSqlBridge.expression(v), books))
  def pq_dist_table(v: Column, books: Array[Array[Array[Double]]]): Column =
    GraftSqlBridge.column(PqDistTable(GraftSqlBridge.expression(v), books))
}
