package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, FloatType}

/** KLL quantile sketch (Karnin–Lang–Liberty, FOCS 2016) — the
  * mergeable streaming-quantiles rung of the sketch ladder
  * (HLL: distinct; KMV: set overlap; Misra-Gries: heavy hitters;
  * CMS: point frequency; KLL: QUANTILES). What it buys over Spark's
  * built-in `percentile_approx` (Greenwald–Khanna): a compact
  * level-weighted buffer with O(k) memory INDEPENDENT of n, a
  * simple byte-serializable state that persists as a column (sketch
  * tables re-aggregate across snapshots, the KMV pattern), and
  * additive-rank-error guarantees ε ≈ O(1/k) that the gated query
  * checks in-artifact against exact ranks.
  *
  * Mechanics: items enter level 0 with weight 1; when the sketch
  * exceeds its capacity the lowest over-full level is SORTED and
  * every other item is promoted to the next level with doubled
  * weight (the rest are discarded). Level capacities shrink
  * geometrically (ratio 2/3) from k at the top, so total memory is
  * ~3k items. Each compaction introduces at most ±w/2 rank error for
  * items of weight w; summed over the level tree this is the
  * published ε·n bound.
  *
  * Determinism: the compaction offset alternates via a per-state
  * compaction counter, so a fixed merge tree reproduces exactly;
  * like Misra-Gries (q102), borderline estimates ARE merge-order
  * dependent — the error bound is not. Rows-only gate with the
  * in-artifact exact-rank check, the q102/q115 pattern.
  *
  * The sketch VALUE is `array<array<double>>`: element i is level
  * i's items in sorted order (weight 2^i) — inspectable and
  * persistable; consumed by [[KllQuantile]].
  */
object KllSketch {
  val DefaultK = 200

  final class State(val k: Int) {
    val levels: ArrayBuffer[ArrayBuffer[Double]] =
      ArrayBuffer(ArrayBuffer.empty[Double])
    var n: Long = 0L
    var compactions: Long = 0L

    private def capacity(level: Int): Int = {
      val depthFromTop = levels.length - 1 - level
      math.max(8, math.ceil(k * math.pow(2.0 / 3.0, depthFromTop)).toInt)
    }

    private def totalCapacity: Int =
      (0 until levels.length).map(capacity).sum

    private def size: Int = levels.map(_.length).sum

    def update(v: Double): Unit = {
      levels(0) += v
      n += 1L
      if (size > totalCapacity) compress()
    }

    def merge(other: State): Unit = {
      var i = 0
      while (i < other.levels.length) {
        while (levels.length <= i) levels += ArrayBuffer.empty[Double]
        levels(i) ++= other.levels(i)
        i += 1
      }
      n += other.n
      compactions += other.compactions
      while (size > totalCapacity) compress()
    }

    /** Sort-and-halve the lowest level at/over its capacity,
      * promoting every other item (deterministic alternating
      * offset) with doubled weight. */
    private def compress(): Unit = {
      var lvl = 0
      while (lvl < levels.length && levels(lvl).length < capacity(lvl)) lvl += 1
      if (lvl >= levels.length) lvl = 0 // all under cap individually: halve level 0
      val buf = levels(lvl)
      if (buf.length < 2) return
      val sorted = buf.sortInPlace()
      val offset = (compactions & 1L).toInt
      compactions += 1L
      if (lvl + 1 >= levels.length) levels += ArrayBuffer.empty[Double]
      val promoted = levels(lvl + 1)
      // compact an EVEN count so total weight is preserved exactly
      // (m items of weight w -> m/2 items of weight 2w); an odd
      // leftover stays at this level uncompacted
      val even = sorted.length & ~1
      var i = offset
      while (i < even) { promoted += sorted(i); i += 2 }
      levels(lvl) =
        if (sorted.length > even) ArrayBuffer(sorted(sorted.length - 1))
        else ArrayBuffer.empty[Double]
    }

    /** Rank-based quantile: the smallest retained value whose
      * cumulative weight reaches p·n. */
    def quantile(p: Double): Double = {
      val items = ArrayBuffer.empty[(Double, Long)]
      var lvl = 0
      while (lvl < levels.length) {
        val w = 1L << lvl
        levels(lvl).foreach(v => items += ((v, w)))
        lvl += 1
      }
      KllSketch.weightedQuantile(items, p).getOrElse(Double.NaN)
    }
  }

  /** Shared weighted-rank estimator — the smallest item whose
    * cumulative weight reaches max(1, ceil(p·W)). Both the in-memory
    * [[State.quantile]] and the SQL [[KllQuantile]] expression route
    * here, so the rank rule (and the p ∈ [0,1] contract) lives in
    * exactly one place (r9 review fix — the two copies could drift,
    * and the SQL face silently clamped out-of-range p). None = empty. */
  private[functions] def weightedQuantile(
      items: ArrayBuffer[(Double, Long)], p: Double): Option[Double] = {
    require(p >= 0.0 && p <= 1.0, s"quantile p must be in [0,1]: $p")
    if (items.isEmpty) None
    else {
      val sorted = items.sortBy(_._1)
      val totalW = sorted.map(_._2).sum
      val target = math.max(1L, math.ceil(p * totalW).toLong)
      var cum = 0L
      var i = 0
      while (i < sorted.length) {
        cum += sorted(i)._2
        if (cum >= target) return Some(sorted(i)._1)
        i += 1
      }
      Some(sorted.last._1)
    }
  }

  def serialize(s: State): Array[Byte] = {
    val nItems = s.levels.map(_.length).sum
    val bb = ByteBuffer.allocate(4 + 8 + 8 + 4 + s.levels.length * 4 + nItems * 8)
    bb.putInt(s.k)
    bb.putLong(s.n)
    bb.putLong(s.compactions)
    bb.putInt(s.levels.length)
    s.levels.foreach { lvl =>
      bb.putInt(lvl.length)
      lvl.foreach(bb.putDouble)
    }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): State = {
    val bb = ByteBuffer.wrap(bytes)
    val s = new State(bb.getInt)
    s.n = bb.getLong
    s.compactions = bb.getLong
    val nLevels = bb.getInt
    s.levels.clear()
    var i = 0
    while (i < nLevels) {
      val m = bb.getInt
      val lvl = new ArrayBuffer[Double](m)
      var j = 0
      while (j < m) { lvl += bb.getDouble; j += 1 }
      s.levels += lvl
      i += 1
    }
    s
  }
}

/** `kll_sketch_agg(value[, k])` → array<array<double>> (level i =
  * sorted items of weight 2^i). */
case class KllSketchAgg(
    child: Expression,
    k: Int = KllSketch.DefaultK,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllSketch.State] {

  require(k >= 8, s"kll_sketch_agg k must be >= 8: $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case DoubleType | FloatType | LongType | IntegerType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"kll_sketch_agg expects a numeric column, got ${other.catalogString}")
    }

  override def createAggregationBuffer(): KllSketch.State =
    new KllSketch.State(k)

  override def update(buf: KllSketch.State, input: InternalRow): KllSketch.State = {
    val v = child.eval(input)
    if (v != null) buf.update(v match {
      case d: java.lang.Double  => d.doubleValue()
      case f: java.lang.Float   => f.toDouble
      case l: java.lang.Long    => l.toDouble
      case i: java.lang.Integer => i.toDouble
    })
    buf
  }

  override def merge(b1: KllSketch.State, b2: KllSketch.State): KllSketch.State = {
    b1.merge(b2)
    b1
  }

  override def eval(buf: KllSketch.State): Any =
    new GenericArrayData(buf.levels.map(lvl =>
      new GenericArrayData(lvl.sorted.toArray[Any])).toArray[Any])

  override def serialize(buf: KllSketch.State): Array[Byte] =
    KllSketch.serialize(buf)
  override def deserialize(bytes: Array[Byte]): KllSketch.State =
    KllSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllSketchAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "kll_sketch_agg"
}

/** `kll_quantile(sketch, p)` → double: rank-based quantile over the
  * level-weighted items (level i weight 2^i). */
case class KllQuantile(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    // Exact sketch shape (array<array<double>>, modulo containsNull),
    // not just "any array" — a mismatched input must fail at ANALYSIS
    // time, not with getArray/getDouble garbage mid-execution.
    val sketchOk = left.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }
    if (sketchOk && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_quantile(sketch array<array<double>>, p double); got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override def nullSafeEval(sk: Any, p: Any): Any = {
    val levels = sk.asInstanceOf[ArrayData]
    val items = ArrayBuffer.empty[(Double, Long)]
    var lvl = 0
    while (lvl < levels.numElements()) {
      val arr = levels.getArray(lvl)
      val w = 1L << lvl
      var j = 0
      while (j < arr.numElements()) {
        items += ((arr.getDouble(j), w)); j += 1
      }
      lvl += 1
    }
    // one shared estimator with State.quantile — same rank rule, same
    // p ∈ [0,1] contract (empty sketch stays SQL-null)
    KllSketch.weightedQuantile(items, p.asInstanceOf[Double])
      .map(java.lang.Double.valueOf).orNull
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantile =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "kll_quantile"
}
