package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** Custom Catalyst aggregate (extension tier: TypedImperativeAggregate
  * with a mutable buffer): streaming SimHash over a column of 16-bit
  * token hash codes.
  *
  * Semantics: per group, bit b of the result is set iff
  * Σ over rows of (±1 depending on bit b of the input code) > 0 —
  * i.e. the classic SimHash bit-vote, but as an AGGREGATE over rows
  * (the per-document array form lives in queries/Dedup.q28; this form
  * fingerprints whole groups, e.g. one signature per source/corpus
  * slice, and powers near-dup detection ACROSS groups).
  *
  * Scale properties that make this the right shape for 100 TB:
  * - buffer is a fixed Array[Long](16) — O(1) memory per group;
  * - partial aggregation applies: votes are summed map-side and
  *   MERGED associatively across partitions, so the shuffle carries
  *   one 136-byte buffer per (partition, group), never the rows;
  * - deterministic — no RNG, so results are oracle-checkable.
  */
case class SimHashAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  val Bits = 16

  // analysis-time type contract: a non-long child fails analysis with
  // a clear message instead of a mid-job executor ClassCastException
  // (the eval below does an unchecked asInstanceOf[Long])
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash_agg requires a BIGINT input, got ${child.dataType.simpleString}" +
        " (cast token codes to long, e.g. TextOps.tokenCodes16)")
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): Array[Long] = new Array[Long](Bits)

  override def update(votes: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val code = v.asInstanceOf[Long]
      var b = 0
      while (b < Bits) {
        votes(b) += (if (((code >> b) & 1L) == 1L) 1L else -1L)
        b += 1
      }
    }
    votes
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < Bits) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(votes: Array[Long]): Any = {
    var h = 0L
    var b = 0
    while (b < Bits) { if (votes(b) > 0) h |= (1L << b); b += 1 }
    h
  }

  override def serialize(votes: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(Bits * 8)
    votes.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(Bits)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "simhash_agg"
}

object SimHashAgg {
  /** simhash_agg(codeCol): one 16-bit SimHash per group from a LongType
    * token-code column. */
  def simhash_agg(code: Column): Column =
    GraftSqlBridge.column(
      SimHashAgg(GraftSqlBridge.expression(code)).toAggregateExpression())
}
