package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}

/** Custom Catalyst aggregate: K-minimum-values distinct sketch — the
  * deterministic cousin of HyperLogLog. Per group it keeps the k
  * SMALLEST DISTINCT values of a uniformly-hashed long column; the
  * k-th smallest h_k estimates the distinct count as
  * (k−1)·D ÷ h_k for hash domain D (Bar-Yossef et al. 2002,
  * "Counting distinct elements in a data stream"). Unlike
  * `approx_count_distinct`, the same inputs yield the SAME sketch on
  * any engine that can sort integers — so the DuckDB oracle
  * hash-matches the estimate itself, not a tolerance boolean (q37's
  * compromise).
  *
  * Scale properties (why this is the 100 TB spelling, vs the q135
  * window reference which shuffles every distinct hash):
  * - buffer is a sorted set capped at k — O(k) memory per group,
  *   independent of group cardinality;
  * - partial aggregation applies: k-min-of-union = k-min of the
  *   merged k-mins, so map-side partials shrink each partition's
  *   contribution to ≤k longs before the shuffle;
  * - mergeable across any corpus split — shards, micro-batches, or
  *   both (the cmsCells property, distinct-count edition).
  *
  * Output: struct(n: BIGINT, kth: BIGINT) — n = min(distinct, k)
  * values retained, kth = the largest retained value. Callers guard
  * the estimate: if n < k the sketch IS the exact distinct count.
  */
case class KmvAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[Long]] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 2)
      TypeCheckResult.TypeCheckFailure(s"kmv_agg requires k >= 2, got $k")
    else if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_agg requires a BIGINT input, got ${child.dataType.simpleString}" +
        " (hash the column to a long first, e.g. conv(substring(md5(x),1,8),16,10))")
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("kth", LongType, nullable = false)))

  override def createAggregationBuffer(): java.util.TreeSet[Long] =
    new java.util.TreeSet[Long]()

  private def insert(buf: java.util.TreeSet[Long], v: Long): Unit =
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last) { if (buf.add(v)) { buf.remove(buf.last); () } }

  override def update(buf: java.util.TreeSet[Long], input: InternalRow)
      : java.util.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: java.util.TreeSet[Long], b: java.util.TreeSet[Long])
      : java.util.TreeSet[Long] = {
    val it = b.iterator()
    while (it.hasNext) insert(a, it.next())
    a
  }

  override def eval(buf: java.util.TreeSet[Long]): Any =
    new GenericInternalRow(Array[Any](
      buf.size.toLong, if (buf.isEmpty) 0L else buf.last))

  override def serialize(buf: java.util.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "kmv_agg"
}

object KmvAgg {
  /** kmv_agg(hashCol, k): struct(n, kth) — the k smallest distinct
    * values' census of a BIGINT hash column, per group. */
  def kmv_agg(hash: Column, k: Int): Column =
    GraftSqlBridge.column(
      KmvAgg(GraftSqlBridge.expression(hash), k).toAggregateExpression())
}
