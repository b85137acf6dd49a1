package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Custom Catalyst aggregate: deterministic bottom-k-by-hash sample —
  * the k (hash, value) pairs with the SMALLEST hash per group, values
  * returned sorted. A bottom-k cut of a uniform hash IS a uniform
  * random sample of the group, and unlike reservoir sampling or
  * t-digest it is MERGE-ORDER-INVARIANT: bottom-k of a union is the
  * bottom-k of merged bottom-ks, so the same inputs yield the same
  * sample under any partitioning (the property the
  * partitioning-invariance gate demands and approximate quantile
  * sketches — GK, t-digest, `approx_percentile` — cannot give) and on
  * any engine that can sort integers, so a DuckDB oracle hash-matches
  * the sampled quantiles themselves ([[KmvAgg]]'s determinism
  * argument, sample edition).
  *
  * Scale properties:
  * - buffer capped at k pairs — O(k) memory per group, independent of
  *   group cardinality;
  * - partial aggregation applies (min-merge family): map-side
  *   partials shrink each partition's contribution to ≤k pairs before
  *   the shuffle;
  * - mergeable across shards AND micro-batches — the incremental twin
  *   lands per-batch bottom-k partials and re-merges (q141's KMV
  *   discipline, sample edition).
  *
  * Collision semantics: the buffer holds DISTINCT (hash, value)
  * pairs; two rows collapse only when a hash collision ALSO carries an
  * equal value. Callers hash a unique row id to ≥60 bits (the q135
  * audit-hash budget: < 1 ppm collisions out to ~10⁸ rows), making
  * the collapse term negligible and the engine-vs-oracle sample
  * identical.
  *
  * Output: ARRAY<BIGINT> — the retained values sorted ascending
  * (ready for ceil-rank quantile indexing).
  */
case class BottomKSample(
    hash: Expression,
    value: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[(Long, Long)]] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 1)
      TypeCheckResult.TypeCheckFailure(s"bottomk_sample requires k >= 1, got $k")
    else if (hash.dataType == LongType && value.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "bottomk_sample requires BIGINT (hash, value) inputs, got " +
        s"(${hash.dataType.simpleString}, ${value.dataType.simpleString})")
  override def children: Seq[Expression] = Seq(hash, value)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): java.util.TreeSet[(Long, Long)] =
    new java.util.TreeSet[(Long, Long)](
      implicitly[Ordering[(Long, Long)]])

  private def insert(buf: java.util.TreeSet[(Long, Long)],
                     p: (Long, Long)): Unit =
    if (buf.size < k) { buf.add(p); () }
    else if (implicitly[Ordering[(Long, Long)]].lt(p, buf.last())) {
      if (buf.add(p)) { buf.remove(buf.last()); () }
    }

  override def update(buf: java.util.TreeSet[(Long, Long)],
                      input: InternalRow): java.util.TreeSet[(Long, Long)] = {
    val h = hash.eval(input)
    val v = value.eval(input)
    if (h != null && v != null)
      insert(buf, (h.asInstanceOf[Long], v.asInstanceOf[Long]))
    buf
  }

  override def merge(a: java.util.TreeSet[(Long, Long)],
                     b: java.util.TreeSet[(Long, Long)])
      : java.util.TreeSet[(Long, Long)] = {
    val it = b.iterator()
    while (it.hasNext) insert(a, it.next())
    a
  }

  override def eval(buf: java.util.TreeSet[(Long, Long)]): Any = {
    val values = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { values(i) = it.next()._2; i += 1 }
    java.util.Arrays.sort(values)
    new GenericArrayData(values)
  }

  override def serialize(buf: java.util.TreeSet[(Long, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) { val p = it.next(); bb.putLong(p._1); bb.putLong(p._2) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Long, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add((bb.getLong, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKSample =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKSample =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(hash = newChildren(0), value = newChildren(1))
  override def prettyName: String = "bottomk_sample"
}

object BottomKSample {
  /** bottomk_sample(hashCol, valueCol, k): the values of the k rows
    * with the smallest (hash, value) pairs, sorted ascending. */
  def bottomk_sample(hash: Column, value: Column, k: Int): Column =
    GraftSqlBridge.column(
      BottomKSample(GraftSqlBridge.expression(hash),
        GraftSqlBridge.expression(value), k).toAggregateExpression())
}
