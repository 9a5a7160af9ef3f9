package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass MOSS winnowing (`winnow_prints(text)`): lowercase →
  * whitespace tokens → 3-word-gram hashes → window-of-4 minima →
  * sorted distinct prints, in a single loop per row.
  *
  * BYTE-FAITHFUL to the declarative chain it replaces (q111/q112's
  * `split(lower(text)) → md5(concat_ws(' ', slice(toks,i,3))) →
  * array_min(slice(hs,j,4)) → array_sort(array_distinct(...))`): the
  * lowercase is UTF8String.toLowerCase (what the `lower` expression
  * calls), the split is Java regex `\s+` with limit -1 (what
  * `split(str, regex)` does — trailing empties kept), and the gram
  * hash is the first 4 md5 bytes as an unsigned 32-bit value
  * (`conv(substring(md5(g),1,8),16,10)`). So the DuckDB oracle
  * mirrors are UNTOUCHED and hash parity is preserved — this is a
  * pure plan-cost change: the interpreted higher-order lambda chain
  * (per-gram string slices + concat + per-window array slices)
  * becomes one JIT'd loop with a reused MessageDigest.
  *
  * Docs with fewer than 6 tokens (no full window) return an EMPTY
  * array — callers filter `size(...) > 0`, preserving the old
  * `size(toks) >= 6` row set (≥6 tokens always yields ≥1 print).
  */
case class WinnowPrints(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow_prints expects a string, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(t: Any): Any =
    WinnowPrints.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.WinnowPrints.compute($t)")

  override protected def withNewChildInternal(
      newChild: Expression): WinnowPrints = copy(child = newChild)

  override def prettyName: String = "winnow_prints"
}

object WinnowPrints {
  private val Empty = new GenericArrayData(Array.emptyLongArray)

  def compute(text: UTF8String): ArrayData = {
    // UTF8String.toLowerCase == the `lower` expression's semantics;
    // gram digest + packing shared with shingle_hashes via GramHash
    val toks = GramHash.Ws.split(text.toLowerCase.toString, -1)
    val m = toks.length
    if (m < 6) return Empty
    val nGrams = m - 2
    val hs = new Array[Long](nGrams)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < nGrams) {
      hs(i) = GramHash.u32(GramHash.digest3(toks, i, sb), 0)
      i += 1
    }
    val nWin = nGrams - 3
    val prints = new Array[Long](nWin)
    var j = 0
    while (j < nWin) {
      var mn = hs(j)
      if (hs(j + 1) < mn) mn = hs(j + 1)
      if (hs(j + 2) < mn) mn = hs(j + 2)
      if (hs(j + 3) < mn) mn = hs(j + 3)
      prints(j) = mn
      j += 1
    }
    java.util.Arrays.sort(prints)
    // distinct on the sorted array
    var k = 0; var w = 0
    while (k < nWin) {
      if (w == 0 || prints(k) != prints(w - 1)) { prints(w) = prints(k); w += 1 }
      k += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(prints, w))
  }
}
