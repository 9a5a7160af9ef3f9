package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: content-defined `win`-codepoint window
  * hashes of a text, ROLLING — the production rung of the CDC window
  * family (Dedup.anchoredWindows). `cdc_window_hashes(text, win)`
  * returns one packed 62-bit hash per ANCHORED position.
  *
  * Two independent polynomial hashes roll across the text in O(1)
  * integer work per position (Rabin–Karp: drop the outgoing
  * codepoint's term, multiply, add the incoming one):
  *   h_b(i) = Σ_j cp[i+j] · b^(win-1-j)  mod  2147483647
  * with bases 257 and 263. A position anchors where h1 % 16 == 0
  * (density 1/16, content-defined: a copied span reproduces its
  * interior anchors under any surrounding bytes — the LBFS/CDC
  * property). The emitted value packs both 31-bit hashes as
  * (h1 << 31) | h2 — one fixed-width join/distinct key, 62 honest
  * collision bits (the shingleHashes convention).
  *
  * This replaces one md5 per position (a ~64-byte block digest plus a
  * 32-char hex allocation, per character of the corpus) with 4
  * multiply/mod per position and no allocation — and unlike md5 the
  * arithmetic is expressible in the DuckDB oracle verbatim
  * (list_reduce over codepoints), so the gate stays hash-exact.
  * Windows are CODEPOINTS, matching length()/substr() semantics in
  * both engines. Texts shorter than `win` yield an empty array.
  */
case class CdcWindowHashes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"cdc_window_hashes expects a string text, got ${left.dataType.catalogString}")
    else if (right.dataType != IntegerType || !right.foldable)
      TypeCheckResult.TypeCheckFailure(
        "cdc_window_hashes expects a literal integer window length")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(t: Any, w: Any): Any =
    CdcWindowHashes.compute(t.asInstanceOf[UTF8String], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, w) =>
      s"graft.functions.CdcWindowHashes.compute($t, $w)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CdcWindowHashes =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cdc_window_hashes"
}

object CdcWindowHashes {
  /** The rolling loop — static so generated code calls straight into
    * it from inside whole-stage codegen (one invokestatic per row; the
    * loop itself is the work and JITs independently of plan shape). */
  def compute(text: UTF8String, win: Int): ArrayData =
    new GenericArrayData(CdcRoll.anchors(text, win)._2)
}

/** The ONE rolling-hash core behind both `cdc_window_hashes` (hash
  * array) and `cdc_window_hits` (pos+hash structs): any change to the
  * bases, modulus, anchor density, or packing lands in both faces —
  * and their shared DuckDB mirror strings — from a single place (r9
  * review fix: the two expressions previously carried verbatim copies
  * of this loop). */
private[functions] object CdcRoll {
  private val P = 2147483647L // 2^31 - 1 (prime; products stay < 2^52)
  private val B1 = 257L
  private val B2 = 263L

  /** (1-based positions, packed 62-bit hashes) of every ANCHORED
    * `win`-codepoint window (anchor: h1 % 16 == 0; pack:
    * (h1 << 31) | h2). Empty pair for texts shorter than `win`. */
  def anchors(text: UTF8String, win: Int): (Array[Int], Array[Long]) = {
    require(win >= 2 && win <= 10000, s"window length out of range: $win")
    val cp = text.toString.codePoints().toArray
    val n = cp.length
    if (n < win) return (Array.emptyIntArray, Array.emptyLongArray)
    // b^(win-1) mod P: the outgoing codepoint's positional weight
    var b1w = 1L; var b2w = 1L
    var j = 0
    while (j < win - 1) { b1w = b1w * B1 % P; b2w = b2w * B2 % P; j += 1 }
    var h1 = 0L; var h2 = 0L
    j = 0
    while (j < win) { h1 = (h1 * B1 + cp(j)) % P; h2 = (h2 * B2 + cp(j)) % P; j += 1 }
    var cap = n / 8 + 4
    var pos = new Array[Int](cap); var hs = new Array[Long](cap)
    var m = 0
    val last = n - win
    var i = 0
    while (i <= last) {
      if (h1 % 16 == 0) {
        if (m == cap) {
          cap *= 2
          pos = java.util.Arrays.copyOf(pos, cap)
          hs = java.util.Arrays.copyOf(hs, cap)
        }
        pos(m) = i + 1 // 1-based, codepoints (the substr convention)
        hs(m) = (h1 << 31) | h2
        m += 1
      }
      if (i < last) {
        h1 = ((h1 - cp(i) * b1w % P + P) % P * B1 + cp(i + win)) % P
        h2 = ((h2 - cp(i) * b2w % P + P) % P * B2 + cp(i + win)) % P
      }
      i += 1
    }
    (java.util.Arrays.copyOf(pos, m), java.util.Arrays.copyOf(hs, m))
  }
}
