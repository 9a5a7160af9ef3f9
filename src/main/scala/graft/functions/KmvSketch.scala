package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** K-minimum-values distinct sketch (Beyer et al., "On Synopses for
  * Distinct-Value Estimation Under Multiset Operations", SIGMOD 2007):
  * keep the k smallest distinct 64-bit hashes of a column. What it
  * buys over the HLL family (q19/q88): KMV sketches support
  * INTERSECTION estimates — audience overlap between segments — which
  * HLL unions cannot express (inclusion-exclusion over HLL estimates
  * compounds error catastrophically for small overlaps).
  *
  * Estimators (hashes normalized to u ∈ [0,1)):
  *   distinct(A)  = k−1 / u_(k)            (exact |A| while |A| < k)
  *   A ∪ B        = KMV(A ∪ B) = k smallest of merged sketches
  *   |A ∩ B|      = ρ · n̂(A∪B), ρ = |K ∩ A ∩ B|/|K|   (K = union sketch)
  * RSE of the distinct estimate ≈ 1/√(k−2); the intersection estimate
  * adds binomial noise √(ρ(1−ρ)/k)·n̂(A∪B). All deterministic on fixed
  * data AND merge-order independent (the k smallest of a multiset do
  * not depend on arrival or merge order) — estimates cannot flap
  * across partitionings, unlike counter-based sketches.
  *
  * Scale shape: one combinable scan pass, k longs per partial buffer —
  * the same constant-size-shuffle rung as q88's HLL rollup and q102's
  * Misra-Gries, for the set-overlap question neither can answer.
  *
  * The sketch VALUE is an `array<bigint>` of the raw hashes in
  * unsigned ascending order — inspectable, persistable (a segment
  * sketch table is ~8·k bytes per segment), and consumed by
  * [[KmvEstimate]] / [[KmvIntersectEstimate]].
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int = KmvSketch.DefaultK,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k > 1, s"kmv_sketch_agg k must be > 1: $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType || child.dataType == LongType ||
        child.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_sketch_agg expects string/bigint/int, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    KmvSketch.newBuffer()

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) KmvSketch.offer(buf, KmvSketch.hashValue(v), k)
    buf
  }

  override def merge(
      b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] =
    KmvSketch.mergeBuffers(b1, b2, k)

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    KmvSketch.evalSet(buf)

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] =
    KmvSketch.serializeSet(buf)

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] =
    KmvSketch.deserializeSet(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketchAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "kmv_sketch_agg"
}

object KmvSketch {
  val DefaultK = 1024
  private val Seed = 0x6b6d76L // "kmv"

  // ---- shared buffer plumbing for BOTH aggregates: union sketches
  // must merge byte/semantics-identically with build sketches, so the
  // order, codec, and merge live in exactly one place (r9 review fix)

  private[functions] def newBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long](UnsignedOrder)

  private[functions] def mergeBuffers(
      b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long],
      k: Int): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) offer(b1, it.next(), k)
    b1
  }

  private[functions] def evalSet(
      buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Any](buf.size)
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(arr)
  }

  private[functions] def serializeSet(
      buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  private[functions] def deserializeSet(
      bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = newBuffer()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  val UnsignedOrder: java.util.Comparator[java.lang.Long] =
    (a: java.lang.Long, b: java.lang.Long) =>
      java.lang.Long.compareUnsigned(a.longValue(), b.longValue())

  private[functions] def hashValue(v: Any): Long = v match {
    case s: UTF8String =>
      XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Seed)
    case l: java.lang.Long => XXH64.hashLong(l.longValue(), Seed)
    case i: java.lang.Integer => XXH64.hashLong(i.longValue(), Seed)
    case other => throw new IllegalArgumentException(
      s"kmv: unsupported value class ${other.getClass}")
  }

  /** Insert into the bounded min-set: no-op when the value is already
    * present or larger than the current k-th smallest of a full set. */
  private[functions] def offer(buf: java.util.TreeSet[java.lang.Long],
      h: Long, k: Int): Unit = {
    val boxed = java.lang.Long.valueOf(h)
    if (buf.size < k) { buf.add(boxed); () }
    else if (UnsignedOrder.compare(boxed, buf.last()) < 0) {
      if (buf.add(boxed)) { buf.pollLast(); () }
    }
  }

  /** Top-53-bits normalization to [0,1) — monotone in unsigned order. */
  private[functions] def toUnit(h: Long): Double =
    math.max((h >>> 11).toDouble * (1.0 / (1L << 53)), java.lang.Double.MIN_NORMAL)

  /** `k` MUST be the sketch's build-time k: the array does not record
    * it, so a mismatch is only detectable in one direction — a sketch
    * LONGER than k throws (definitely built with a larger k), but a
    * saturated sketch probed with a LARGER k is indistinguishable from
    * an unsaturated exact set and silently returns its length as an
    * "exact" count (a 128-length sketch of 10M distincts probed with
    * k=1024 reads as 128). Callers pass the same literal to the agg
    * and the estimator — every in-repo site does. */
  private[functions] def estimate(sorted: Array[Long], k: Int): Double = {
    require(sorted.length <= k,
      s"kmv_estimate: ${sorted.length}-hash sketch exceeds k=$k — " +
        "built with a larger k; pass the build-time k")
    if (sorted.length < k) sorted.length.toDouble
    else (k - 1).toDouble / toUnit(sorted(k - 1))
  }

  /** Merged-union estimate + common-fraction intersection estimate
    * over two sorted (unsigned asc) sketch arrays. Same build-time-k
    * contract (and the same one-sided check) as [[estimate]]. */
  private[functions] def intersectEstimate(a: Array[Long], b: Array[Long],
      k: Int): Double = {
    require(a.length <= k && b.length <= k,
      s"kmv_intersect_estimate: sketch lengths (${a.length}, ${b.length}) " +
        s"exceed k=$k — built with a larger k; pass the build-time k")
    // merge to the union's k smallest distinct, counting members of both
    var ia = 0; var ib = 0; var n = 0; var common = 0
    var kth = 0L
    while (n < k && (ia < a.length || ib < b.length)) {
      val cmp =
        if (ia >= a.length) 1
        else if (ib >= b.length) -1
        else java.lang.Long.compareUnsigned(a(ia), b(ib))
      if (cmp == 0) { kth = a(ia); ia += 1; ib += 1; common += 1 }
      else if (cmp < 0) { kth = a(ia); ia += 1 }
      else { kth = b(ib); ib += 1 }
      n += 1
    }
    if (n == 0) return 0.0
    val unionEst =
      if (n < k) n.toDouble // both sketches exhausted: exact union
      else (k - 1).toDouble / toUnit(kth)
    unionEst * common / n
  }
}

/** `kmv_union_agg(sketch[, k])`: merge already-built KMV sketch ARRAYS
  * into the union's sketch — the `hll_union_agg` pattern for the KMV
  * family. A persisted per-(day, segment) sketch table rolls up to
  * weekly/total distinct AND intersection estimates without touching
  * raw events again (q88's incremental-rollup shape, plus the set
  * algebra HLL lacks). Union of KMV sketches is itself an exact KMV
  * sketch of the united set's hashes, so all [[KmvSketchAgg]]
  * guarantees (merge-order independence, exactness below k) carry
  * over. */
case class KmvUnionAgg(
    child: Expression,
    k: Int = KmvSketch.DefaultK,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k > 1, s"kmv_union_agg k must be > 1: $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"kmv_union_agg expects array<bigint> sketches, got ${t.catalogString}")
  }

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    KmvSketch.newBuffer()

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      while (i < arr.numElements()) {
        KmvSketch.offer(buf, arr.getLong(i), k)
        i += 1
      }
    }
    buf
  }

  override def merge(
      b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] =
    KmvSketch.mergeBuffers(b1, b2, k)

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    KmvSketch.evalSet(buf)

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] =
    KmvSketch.serializeSet(buf)

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] =
    KmvSketch.deserializeSet(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvUnionAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "kmv_union_agg"
}

/** `kmv_estimate(sketch[, k])`: distinct-count estimate from a KMV
  * sketch array (exact while the set stayed under k). Operates on
  * k-element group-level arrays, not the per-row hot path — eval-only
  * is the right altitude. */
case class KmvEstimate(child: Expression, k: Int = KmvSketch.DefaultK)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"kmv_estimate expects array<bigint>, got ${t.catalogString}")
  }
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else KmvSketch.estimate(v.asInstanceOf[ArrayData].toLongArray(), k)
  }
  override protected def withNewChildInternal(newChild: Expression): KmvEstimate =
    copy(child = newChild)
  override def prettyName: String = "kmv_estimate"
}

/** `kmv_intersect_estimate(a, b[, k])`: |A ∩ B| estimate from two KMV
  * sketches — ρ·n̂(A∪B) over the merged union sketch. Exact when both
  * inputs stayed under k (the sketches ARE the hash sets). */
case class KmvIntersectEstimate(left: Expression, right: Expression,
    k: Int = KmvSketch.DefaultK)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"kmv_intersect_estimate expects two array<bigint>, got " +
          s"${l.catalogString}, ${r.catalogString}")
    }
  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null || b == null) null
    else KmvSketch.intersectEstimate(
      a.asInstanceOf[ArrayData].toLongArray(),
      b.asInstanceOf[ArrayData].toLongArray(), k)
  }
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): KmvIntersectEstimate =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "kmv_intersect_estimate"
}
