package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/** Product-quantization kernels (the Jégou et al. PQ codec): the
  * vector compression half of the IVF-PQ recipe every billion-scale
  * ANN deployment runs (IVF = coarse partition pruning, already in
  * `operators/IvfIndex`; PQ = per-vector compression so the probed
  * cells' vectors fit in memory as m bytes instead of d floats).
  *
  * `pq_encode(embedding, codebook)` → array<int> of m subspace codes:
  * the embedding is split into m contiguous subvectors and each is
  * assigned its nearest (squared-L2, tie → lower code) centroid from
  * that subspace's k-entry codebook. The codebook is a FOLDABLE
  * array<double> of m·k·dsub values laid out [subspace][code][dim],
  * evaluated once at plan time and probed from a plain double[] —
  * the PackedLmSum pattern.
  *
  * `pq_adc(codes, lut)` → double: asymmetric distance computation —
  * Σ_s lut[s·k + codes[s]], where the query-specific lut (m·k packed,
  * plus the caller-provided k as the third argument... see below) is
  * the per-subspace squared distance from the query's subvectors to
  * every centroid. One add per subspace per row — the reason PQ scans
  * are memory-bandwidth-bound, not FLOP-bound.
  */
case class PqEncode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = left.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (!vecOk)
      TypeCheckResult.TypeCheckFailure(
        s"pq_encode expects array<float|double> vector, got ${left.dataType.catalogString}")
    else if (!right.foldable || (right.dataType match {
      case StructType(_) => true
      case ArrayType(DoubleType, _) => false
      case _ => true
    }))
      TypeCheckResult.TypeCheckFailure(
        "pq_encode expects a foldable array<double> codebook header")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  // header layout: [m, k, dsub, then m*k*dsub centroid values]
  @transient private lazy val cb: Array[Double] =
    right.eval().asInstanceOf[ArrayData].toDoubleArray()

  private def leftIsFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(v: Any, unused: Any): Any =
    PqEncode.compute(v.asInstanceOf[ArrayData], cb, leftIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("cb", cb, "double[]")
    val isF = leftIsFloat
    nullSafeCodeGen(ctx, ev, (v, _) =>
      s"${ev.value} = graft.functions.PqEncode.compute($v, $cbRef, $isF);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncode =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "pq_encode"
}

object PqEncode {
  /** header: cb(0)=m, cb(1)=k, cb(2)=dsub, centroids follow. */
  def compute(vec: ArrayData, cb: Array[Double], isFloat: Boolean): ArrayData = {
    val m = cb(0).toInt; val k = cb(1).toInt; val dsub = cb(2).toInt
    // Bounds check before the hot loops: on UnsafeArrayData an
    // out-of-range getFloat reads arbitrary memory SILENTLY (wrong
    // codes, no error) — a short/corrupt embedding row must fail
    // loudly instead (r9 review fix).
    if (vec.numElements() < m * dsub)
      throw new IllegalArgumentException(
        s"pq_encode: vector has ${vec.numElements()} dims, codebook " +
          s"expects m*dsub = ${m * dsub}")
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val base = s * dsub
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        val cbase = 3 + (s * k + c) * dsub
        var d = 0.0
        var j = 0
        while (j < dsub) {
          val x = if (isFloat) vec.getFloat(base + j).toDouble
                  else vec.getDouble(base + j)
          val diff = x - cb(cbase + j)
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes)
  }
}

/** See [[PqEncode]]. lut header layout: [m, k, then m·k values]. */
case class PqAdc(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType match {
      case ArrayType(IntegerType, _) => false
      case _ => true
    })
      TypeCheckResult.TypeCheckFailure(
        s"pq_adc expects array<int> codes, got ${left.dataType.catalogString}")
    else if (!right.foldable || (right.dataType match {
      case ArrayType(DoubleType, _) => false
      case _ => true
    }))
      TypeCheckResult.TypeCheckFailure(
        "pq_adc expects a foldable array<double> distance LUT header")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = DoubleType

  @transient private lazy val lut: Array[Double] =
    right.eval().asInstanceOf[ArrayData].toDoubleArray()

  override def nullSafeEval(codes: Any, unused: Any): Any =
    PqAdc.compute(codes.asInstanceOf[ArrayData], lut)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lutRef = ctx.addReferenceObj("lut", lut, "double[]")
    nullSafeCodeGen(ctx, ev, (codes, _) =>
      s"${ev.value} = graft.functions.PqAdc.compute($codes, $lutRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "pq_adc"
}

object PqAdc {
  /** header: lut(0)=m, lut(1)=k, per-(subspace, code) values follow. */
  def compute(codes: ArrayData, lut: Array[Double]): Double = {
    val m = lut(0).toInt; val k = lut(1).toInt
    if (codes.numElements() < m)
      throw new IllegalArgumentException(
        s"pq_adc: ${codes.numElements()} codes, LUT expects m = $m")
    var sum = 0.0
    var s = 0
    while (s < m) {
      val c = codes.getInt(s)
      if (c < 0 || c >= k)
        throw new IllegalArgumentException(
          s"pq_adc: code $c out of [0, $k) in subspace $s")
      sum += lut(2 + s * k + c)
      s += 1
    }
    sum
  }
}
