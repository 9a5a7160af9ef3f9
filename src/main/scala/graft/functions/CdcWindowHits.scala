package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** [[CdcWindowHashes]] with POSITIONS: `cdc_window_hits(text, win)`
  * returns array<struct<pos int, h bigint>> — one element per anchored
  * window, `pos` 1-based in CODEPOINTS (the substr convention both
  * engines share), `h` the same packed 62-bit rolled hash. The
  * position-carrying face exists for span work (merge duplicated
  * windows into maximal masked character ranges — the removal ACTION
  * of exact substring dedup, where CdcWindowHashes is the signal);
  * hash-only consumers should prefer CdcWindowHashes, whose output is
  * a primitive long array with no per-anchor struct. Same rolling
  * arithmetic, same DuckDB-expressible mirror, same 1/16 anchor
  * density, same empty array under `win` codepoints.
  */
case class CdcWindowHits(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"cdc_window_hits expects a string text, got ${left.dataType.catalogString}")
    else if (right.dataType != IntegerType || !right.foldable)
      TypeCheckResult.TypeCheckFailure(
        "cdc_window_hits expects a literal integer window length")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("h", LongType, nullable = false))), containsNull = false)

  override def nullSafeEval(t: Any, w: Any): Any =
    CdcWindowHits.compute(t.asInstanceOf[UTF8String], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, w) =>
      s"graft.functions.CdcWindowHits.compute($t, $w)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CdcWindowHits =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cdc_window_hits"
}

object CdcWindowHits {
  private val P = 2147483647L
  private val B1 = 257L
  private val B2 = 263L

  def compute(text: UTF8String, win: Int): ArrayData = {
    require(win >= 2 && win <= 10000, s"window length out of range: $win")
    val cp = text.toString.codePoints().toArray
    val n = cp.length
    if (n < win) return new GenericArrayData(Array.empty[Any])
    var b1w = 1L; var b2w = 1L
    var j = 0
    while (j < win - 1) { b1w = b1w * B1 % P; b2w = b2w * B2 % P; j += 1 }
    var h1 = 0L; var h2 = 0L
    j = 0
    while (j < win) { h1 = (h1 * B1 + cp(j)) % P; h2 = (h2 * B2 + cp(j)) % P; j += 1 }
    val out = new java.util.ArrayList[InternalRow](n / 8 + 4)
    val last = n - win
    var i = 0
    while (i <= last) {
      if (h1 % 16 == 0)
        out.add(new GenericInternalRow(
          Array[Any](i + 1, (h1 << 31) | h2))) // 1-based pos
      if (i < last) {
        h1 = ((h1 - cp(i) * b1w % P + P) % P * B1 + cp(i + win)) % P
        h2 = ((h2 - cp(i) * b2w % P + P) % P * B2 + cp(i + win)) % P
      }
      i += 1
    }
    new GenericArrayData(out.toArray(new Array[InternalRow](out.size))
      .asInstanceOf[Array[Any]])
  }
}
