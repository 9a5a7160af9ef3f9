package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native char-bigram kernels for the q109 perplexity-proxy scorer.
  *
  * `char_bigrams_packed(text)` → array<bigint>: consecutive CODEPOINT
  * pairs of the LOWERCASED text, packed cp1·2^21 + cp2 (2^21 > max
  * codepoint, collision-free) — the train-phase stream, without the
  * split-to-char-strings allocation (~2 string objects per corpus
  * char) the declarative chain paid. Lowercase is
  * UTF8String.toLowerCase, i.e. the `lower` expression's semantics.
  * Texts with < 2 codepoints yield an empty array.
  */
case class CharBigramsPacked(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_bigrams_packed expects a string, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(t: Any): Any =
    CharBigramsPacked.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"graft.functions.CharBigramsPacked.compute($t)")

  override protected def withNewChildInternal(
      newChild: Expression): CharBigramsPacked = copy(child = newChild)

  override def prettyName: String = "char_bigrams_packed"
}

object CharBigramsPacked {
  def compute(text: UTF8String): ArrayData = {
    val cp = text.toLowerCase.toString.codePoints().toArray
    if (cp.length < 2) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](cp.length - 1)
    var i = 0
    while (i < out.length) {
      out(i) = cp(i).toLong * 2097152L + cp(i + 1)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `packed_lm_sum(bigrams, lp)` → double: Σ over a packed-bigram array
  * of `lp[(bg >> 21)·128 + (bg & 0x1FFFFF)]`, accumulated STRICTLY
  * left-to-right (the same order as the HOF `aggregate` fold it
  * replaces, so round(sum/n, 6) stays bit-identical). `lp` must be a
  * FOLDABLE 16384-double dense table (single-byte corpora only — the
  * caller proves that from the trained model before choosing this
  * path); it is evaluated once at plan time, not per row.
  */
case class PackedLmSum(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != ArrayType(LongType, containsNull = false) &&
      left.dataType != ArrayType(LongType, containsNull = true))
      TypeCheckResult.TypeCheckFailure(
        s"packed_lm_sum expects array<bigint> bigrams, got ${left.dataType.catalogString}")
    else if (!right.foldable || (right.dataType match {
      case ArrayType(DoubleType, _) => false
      case _ => true
    }))
      TypeCheckResult.TypeCheckFailure(
        "packed_lm_sum expects a foldable array<double> log-prob table")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = DoubleType

  @transient private lazy val lp: Array[Double] =
    right.eval().asInstanceOf[ArrayData].toDoubleArray()

  override def nullSafeEval(bgs: Any, unused: Any): Any =
    PackedLmSum.compute(bgs.asInstanceOf[ArrayData], lp)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lpRef = ctx.addReferenceObj("lp", lp, "double[]")
    nullSafeCodeGen(ctx, ev, (bgs, _) =>
      s"${ev.value} = graft.functions.PackedLmSum.compute($bgs, $lpRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PackedLmSum =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "packed_lm_sum"
}

object PackedLmSum {
  def compute(bgs: ArrayData, lp: Array[Double]): Double = {
    val n = bgs.numElements()
    var sum = 0.0
    var i = 0
    while (i < n) {
      val bg = bgs.getLong(i)
      sum += lp(((bg >> 21) * 128 + (bg & 0x1FFFFF)).toInt)
      i += 1
    }
    sum
  }
}
