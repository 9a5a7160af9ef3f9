package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** Custom Catalyst aggregate: `bits`-wide SimHash of a stream of token
  * hashes, accumulated in ONE mutable counter buffer instead of `bits`
  * separate SUM(CASE...) columns — a single pass per row, compact
  * partial-aggregation state, and mergeable across partitions
  * (map-side combine works as usual).
  *
  * Registered twice: `simhash_agg(hash_col)` (16-bit, over the 32-bit
  * portable hash) and `simhash64_agg(hash_col)` (64-bit, over the
  * packed 64-bit portable hash). Each == its declarative SUM-column
  * formulation (see Dedup.simhash / Dedup.simhash64); the equivalences
  * are spec-verified.
  */
case class SimHashAgg(
    child: Expression,
    bits: Int = 16,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  private val BITS = bits

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash_agg expects bigint, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): Array[Int] = new Array[Int](BITS)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < BITS) {
        buf(i) += (if (((h >> i) & 1L) == 1L) 1 else -1)
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Int], b2: Array[Int]): Array[Int] = {
    var i = 0
    while (i < BITS) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Int]): Any = {
    var fp = 0L
    var i = 0
    while (i < BITS) {
      if (buf(i) > 0) fp |= (1L << i)
      i += 1
    }
    fp
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(BITS * 4)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(BITS)(bb.getInt())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimHashAgg =
    copy(child = newChildren.head)

  override def prettyName: String =
    if (bits == 64) "simhash64_agg" else "simhash_agg"
}
