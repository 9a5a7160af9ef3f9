package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, SQLOrderingUtil}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Exact interpolated percentile over a DOUBLE column
  * (`percentile_exact(value, percentages[, freq])`) — a drop-in,
  * value-identical replacement for Spark's built-in `percentile` on
  * double inputs, with the per-row hot path moved off the built-in's
  * boxed OpenHashMap[java.lang.Double, Long] onto a primitive
  * open-addressing map keyed by Double.doubleToLongBits.
  *
  * VALUE-FAITHFUL to the built-in (and hence to the DuckDB
  * quantile_cont mirrors the gates compare against):
  *  - key identity: doubleToLongBits equality IS java.lang.Double
  *    .equals (canonical NaN; -0.0 and 0.0 distinct) — the same
  *    grouping the built-in's boxed keys produce;
  *  - sort order: SQLOrderingUtil.compareDoubles, the exact ordering
  *    PhysicalDoubleType hands the built-in's sortBy;
  *  - interpolation: the built-in's formula verbatim — position =
  *    p·(N−1), lower/higher = floor/ceil, cumulative-count binary
  *    search with (-insertionPoint−1) semantics, result =
  *    (higher−position)·lowerKey + (position−lower)·higherKey in that
  *    operation order — so every emitted double is bit-identical;
  *  - frequency semantics: rows with null value or null frequency are
  *    skipped, frequency 0 adds nothing, negative frequency throws.
  * The built-in stays registered; only double-typed call sites opt in.
  */
case class PercentileExactAgg(
    child: Expression,
    percentageExpression: Expression,
    frequencyExpression: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[PercentileExactAgg.DoubleCounts] {

  // NOTE: input coercion (decimal literals in `array(0.5, ...)`,
  // integral frequencies) happens in the registration builder
  // (GraftExtensions) — AbstractDataType/ImplicitCastInputTypes are
  // private[sql], so the builder inserts the Casts explicitly.

  def this(child: Expression, percentageExpression: Expression) =
    this(child, percentageExpression, Literal(1L))

  override def children: Seq[Expression] =
    Seq(child, percentageExpression, frequencyExpression)

  override def nullable: Boolean = true

  @transient private lazy val returnArray: Boolean =
    percentageExpression.dataType.isInstanceOf[ArrayType]

  @transient private lazy val percentages: Array[Double] =
    percentageExpression.eval() match {
      case null => null
      case d: Double => Array(d)
      case a: ArrayData => a.toDoubleArray()
      case x: Number => Array(x.doubleValue())
    }

  override def dataType: DataType =
    if (returnArray) ArrayType(DoubleType, containsNull = false)
    else DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    val pOk = percentageExpression.foldable &&
      (percentageExpression.dataType match {
        case DoubleType | ArrayType(DoubleType, _) => true
        case _ => false
      })
    if (child.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"percentile_exact expects a double value, got ${child.dataType.catalogString}")
    else if (!pOk)
      TypeCheckResult.TypeCheckFailure(
        "percentile_exact expects a foldable double or array<double> percentage")
    else if (percentages == null || percentages.exists(p => p < 0.0 || p > 1.0))
      TypeCheckResult.TypeCheckFailure(
        "percentile_exact percentages must be non-null and in [0, 1]")
    else if (frequencyExpression.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"percentile_exact expects a bigint frequency, got ${frequencyExpression.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): PercentileExactAgg.DoubleCounts =
    new PercentileExactAgg.DoubleCounts()

  override def update(buf: PercentileExactAgg.DoubleCounts,
      input: InternalRow): PercentileExactAgg.DoubleCounts = {
    val v = child.eval(input)
    if (v != null) {
      val f = frequencyExpression.eval(input)
      if (f != null) {
        val fl = f.asInstanceOf[Long]
        if (fl < 0L) throw new IllegalArgumentException(
          "Negative values found in percentile_exact frequency")
        if (fl > 0L) buf.add(v.asInstanceOf[Double], fl)
      }
    }
    buf
  }

  override def merge(b1: PercentileExactAgg.DoubleCounts,
      b2: PercentileExactAgg.DoubleCounts): PercentileExactAgg.DoubleCounts = {
    b1.mergeFrom(b2)
    b1
  }

  override def eval(buf: PercentileExactAgg.DoubleCounts): Any = {
    if (buf.size == 0) return null
    val (values, cums) = buf.sortedCumulative()
    val results = percentages.map(getPercentile(values, cums, _))
    if (returnArray) new GenericArrayData(results) else results(0)
  }

  /** The built-in's getPercentile verbatim over (sorted values,
    * cumulative counts): same floor/ceil positions, same binary-search
    * index rule, same interpolation operation order. */
  private def getPercentile(values: Array[Double], cums: Array[Long],
      percentage: Double): Double = {
    val maxPosition = cums(cums.length - 1) - 1
    val position = percentage * maxPosition
    val lower = math.floor(position).toLong
    val higher = math.ceil(position).toLong
    val lowerIndex = binarySearchCount(cums, lower + 1)
    val lowerKey = values(lowerIndex)
    if (higher == lower) return lowerKey
    val higherIndex = binarySearchCount(cums, higher + 1)
    val higherKey = values(higherIndex)
    if (java.lang.Double.compare(higherKey, lowerKey) == 0) return lowerKey
    (higher - position) * lowerKey + (position - lower) * higherKey
  }

  private def binarySearchCount(cums: Array[Long], value: Long): Int =
    java.util.Arrays.binarySearch(cums, 0, cums.length, value) match {
      case ix if ix < 0 => -(ix + 1)
      case ix => ix
    }

  override def serialize(buf: PercentileExactAgg.DoubleCounts): Array[Byte] = {
    // int-arithmetic guard (r14 ADVICE): past ~134M distinct keys the
    // 4 + size*16 byte count overflows to a negative allocate() size —
    // fail with the real diagnosis instead of an opaque
    // IllegalArgumentException from ByteBuffer.
    require(buf.size <= (Int.MaxValue - 4) / 16,
      s"percentile_exact: ${buf.size} distinct values in one group " +
        "exceed the exact-percentile buffer limit ((2^31-5)/16 keys); " +
        "use approx_percentile for near-continuous columns at this scale")
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreachEntry { (bits, cnt) => bb.putLong(bits); bb.putLong(cnt); () }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): PercentileExactAgg.DoubleCounts = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val m = new PercentileExactAgg.DoubleCounts(
      Integer.highestOneBit(math.max(n * 2 - 1, 63)) * 2)
    var i = 0
    while (i < n) {
      val bits = bb.getLong(); val cnt = bb.getLong()
      m.addBits(bits, cnt)
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): PercentileExactAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): PercentileExactAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PercentileExactAgg =
    copy(child = newChildren(0), percentageExpression = newChildren(1),
      frequencyExpression = newChildren(2))

  override def prettyName: String = "percentile_exact"
}

object PercentileExactAgg {

  /** Primitive open-addressing (value-bits → count) map. Empty slot ⇔
    * cnts(i) == 0 (counts of present keys are always ≥ 1), so key bits
    * 0L (+0.0) need no sentinel. Power-of-two capacity, load ≤ 0.5. */
  final class DoubleCounts(initialCapacity: Int = 64) {
    private var cap = Integer.highestOneBit(math.max(initialCapacity, 16))
    private var keys = new Array[Long](cap)
    private var cnts = new Array[Long](cap)
    var size: Int = 0

    private def mix(h0: Long): Int = {
      // splitmix64 finalizer — only slot placement, never semantics
      var h = h0
      h ^= (h >>> 33); h *= 0xff51afd7ed558ccdL
      h ^= (h >>> 33); h *= 0xc4ceb9fe1a85ec53L
      h ^= (h >>> 33)
      h.toInt
    }

    def add(v: Double, c: Long): Unit =
      addBits(java.lang.Double.doubleToLongBits(v), c)

    def addBits(bits: Long, c: Long): Unit = {
      var i = mix(bits) & (cap - 1)
      while (cnts(i) != 0L && keys(i) != bits) i = (i + 1) & (cap - 1)
      if (cnts(i) == 0L) {
        keys(i) = bits; cnts(i) = c; size += 1
        if (size * 2 > cap) grow()
      } else cnts(i) += c
    }

    private def grow(): Unit = {
      val ok = keys; val oc = cnts
      cap *= 2
      keys = new Array[Long](cap); cnts = new Array[Long](cap)
      size = 0
      var i = 0
      while (i < ok.length) {
        if (oc(i) != 0L) addBits(ok(i), oc(i))
        i += 1
      }
    }

    def mergeFrom(o: DoubleCounts): Unit =
      o.foreachEntry { (bits, cnt) => addBits(bits, cnt) }

    def foreachEntry(f: (Long, Long) => Unit): Unit = {
      var i = 0
      while (i < cap) {
        if (cnts(i) != 0L) f(keys(i), cnts(i))
        i += 1
      }
    }

    /** (values sorted by SQLOrderingUtil.compareDoubles, cumulative
      * counts in that order). */
    def sortedCumulative(): (Array[Double], Array[Long]) = {
      val vs = new Array[java.lang.Double](size)
      val cs = new java.util.HashMap[Long, Long](size * 2)
      var j = 0
      foreachEntry { (bits, cnt) =>
        vs(j) = java.lang.Double.longBitsToDouble(bits)
        cs.put(bits, cnt)
        j += 1
      }
      java.util.Arrays.sort(vs, new java.util.Comparator[java.lang.Double] {
        override def compare(a: java.lang.Double, b: java.lang.Double): Int =
          SQLOrderingUtil.compareDoubles(a.doubleValue(), b.doubleValue())
      })
      val values = new Array[Double](size)
      val cums = new Array[Long](size)
      var acc = 0L
      var i = 0
      while (i < size) {
        values(i) = vs(i).doubleValue()
        acc += cs.get(java.lang.Double.doubleToLongBits(values(i)))
        cums(i) = acc
        i += 1
      }
      (values, cums)
    }
  }
}
