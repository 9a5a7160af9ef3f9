package graft.functions

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
  /** Same [[CdcRoll]] core as `cdc_window_hashes`; this face only
    * shapes the (pos, h) pairs into struct rows. */
  def compute(text: UTF8String, win: Int): ArrayData = {
    val (pos, hs) = CdcRoll.anchors(text, win)
    val out = new Array[Any](pos.length)
    var i = 0
    while (i < pos.length) {
      out(i) = new GenericInternalRow(Array[Any](pos(i), hs(i)))
      i += 1
    }
    new GenericArrayData(out)
  }
}
