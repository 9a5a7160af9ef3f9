package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable heavy-hitters sketch: the Misra-Gries frequent-items
  * summary as a Catalyst aggregate — `freq_topk_agg(item[, capacity])`
  * over a string or bigint column, default capacity 64.
  *
  * Why a sketch: the exact top-k (q57's groupBy + rank) shuffles the
  * WHOLE token stream on the token key. The MG summary keeps at most
  * `capacity` counters per partial buffer, so at 100 TB the shuffle
  * carries `capacity` rows per map task — sketch-sized, like the HLL
  * rollup (q88) — one scan pass, no token-key shuffle at all.
  *
  * Guarantees (Misra-Gries, and the Agarwal et al. "Mergeable
  * Summaries" merge — add counters pointwise, subtract the
  * (capacity+1)-th largest value, drop non-positives — which preserves
  * them under ANY merge tree, so Spark's partial/final plan and
  * arbitrary partition orders are safe):
  *   est(x) <= f(x)                              (never over-counts)
  *   est(x) >= f(x) - n/(capacity+1)             (bounded under-count)
  * so every item with f(x) > n/(capacity+1) is present. Counter VALUES
  * for borderline items may differ with merge order; the bounds do not
  * — spec-asserted against exact counts across partition layouts.
  *
  * Output: array<struct<item, est_count>> sorted (est_count desc, item
  * asc).
  */
case class FreqTopKAgg(
    child: Expression,
    capacity: Int = 64,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[AnyRef, java.lang.Long]] {

  require(capacity > 0, s"freq_topk_agg capacity must be positive: $capacity")

  private def isString = child.dataType == StringType

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", child.dataType),
    StructField("est_count", LongType))))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType || child.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"freq_topk_agg expects string or bigint, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): java.util.HashMap[AnyRef, java.lang.Long] =
    new java.util.HashMap[AnyRef, java.lang.Long]()

  override def update(
      buf: java.util.HashMap[AnyRef, java.lang.Long],
      input: InternalRow): java.util.HashMap[AnyRef, java.lang.Long] = {
    val v = child.eval(input).asInstanceOf[AnyRef]
    if (v != null) {
      val cur = buf.get(v)
      if (cur != null) buf.put(v, cur + 1L)
      else if (buf.size < capacity) {
        // defensive copy: Spark reuses UTF8String-backed buffers
        val key: AnyRef = v match {
          case s: UTF8String => s.clone()
          case other => other
        }
        buf.put(key, 1L)
      } else {
        // classic MG decrement-all on a full miss; zeros drop
        val it = buf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    buf
  }

  override def merge(
      b1: java.util.HashMap[AnyRef, java.lang.Long],
      b2: java.util.HashMap[AnyRef, java.lang.Long]): java.util.HashMap[AnyRef, java.lang.Long] = {
    b2.forEach { (k, v) =>
      val cur = b1.get(k)
      b1.put(k, if (cur == null) v else java.lang.Long.valueOf(cur + v))
    }
    if (b1.size > capacity) {
      // subtract the (capacity+1)-th largest counter from everything;
      // at most `capacity` counters can exceed it, zeros drop
      val values = new Array[Long](b1.size)
      var i = 0
      val vit = b1.values().iterator()
      while (vit.hasNext) { values(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(values)
      val threshold = values(b1.size - capacity - 1)
      val it = b1.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val nv = e.getValue - threshold
        if (nv <= 0L) it.remove() else e.setValue(nv)
      }
    }
    b1
  }

  override def eval(buf: java.util.HashMap[AnyRef, java.lang.Long]): Any = {
    val entries = new Array[(AnyRef, Long)](buf.size)
    var i = 0
    buf.forEach { (k, v) => entries(i) = (k, v.longValue()); i += 1 }
    val sorted = entries.sortWith { case ((k1, c1), (k2, c2)) =>
      if (c1 != c2) c1 > c2
      else (k1, k2) match {
        case (a: UTF8String, b: UTF8String) => a.compareTo(b) < 0
        case (a: java.lang.Long, b: java.lang.Long) => a < b
        case _ => false
      }
    }
    new GenericArrayData(sorted.map { case (k, c) =>
      InternalRow(k, c)
    }.toArray[Any])
  }

  override def serialize(buf: java.util.HashMap[AnyRef, java.lang.Long]): Array[Byte] = {
    var bytes = 4
    buf.forEach { (k, _) =>
      bytes += 8 + (k match {
        case s: UTF8String => 4 + s.numBytes()
        case _ => 8
      })
    }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buf.size)
    buf.forEach { (k, v) =>
      k match {
        case s: UTF8String =>
          val b = s.getBytes
          bb.putInt(b.length); bb.put(b)
        case l: java.lang.Long => bb.putLong(l)
      }
      bb.putLong(v)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[AnyRef, java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.HashMap[AnyRef, java.lang.Long](n * 2)
    var i = 0
    while (i < n) {
      val key: AnyRef =
        if (isString) {
          val len = bb.getInt
          val b = new Array[Byte](len)
          bb.get(b)
          UTF8String.fromBytes(b)
        } else java.lang.Long.valueOf(bb.getLong)
      buf.put(key, bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqTopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqTopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqTopKAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "freq_topk_agg"
}
