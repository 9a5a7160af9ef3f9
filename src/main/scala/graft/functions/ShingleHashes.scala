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

/** Native one-pass shingle hashing (`shingle_hashes(text)`):
  * whitespace tokens → 3-word grams → md5 → BOTH independent 32-bit
  * halves packed into one long `(h1 << 32) | h2`, in a single loop
  * per row. Duplicates kept in position order (min-hash is
  * multiset-invariant; exact-set consumers `.distinct()` after the
  * explode, where the 8-byte packed key is also a cheaper
  * shuffle/distinct key than the former two-long pair).
  *
  * BYTE-FAITHFUL to the declarative chain it replaces (the
  * shingle-family hot loop: `split(text,'\\s+') →
  * md5(concat_ws(' ', slice(toks,i,3))) → conv(substring(hex,1,8)) /
  * conv(substring(hex,9,8))`): the split is Java regex `\s+` with
  * limit -1 (exactly `split(str, regex)` — trailing empties kept, NO
  * lowercase: shingles hash the raw text), h1 is md5 bytes 0-3 and
  * h2 bytes 4-7 as unsigned 32-bit values. The DuckDB mirrors
  * (`('0x'||substr(md5(sh),1,8))::BIGINT`) are UNTOUCHED and hash
  * parity is preserved — this is a pure plan-cost change: per-shingle
  * string slice/concat allocations plus the md5-hex → substring →
  * conv parse chain collapse into one JIT'd loop with a reused
  * MessageDigest and no hex-string round-trip.
  *
  * Docs with fewer than 3 tokens return an EMPTY array (the old
  * `size(toks) >= 3` filter — explode of empty drops the row).
  */
case class ShingleHashes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes expects a string, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(t: Any): Any =
    ShingleHashes.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.ShingleHashes.compute($t)")

  override protected def withNewChildInternal(
      newChild: Expression): ShingleHashes = copy(child = newChild)

  override def prettyName: String = "shingle_hashes"
}

object ShingleHashes {
  private val Empty = new GenericArrayData(Array.emptyLongArray)

  def compute(text: UTF8String): ArrayData = {
    val toks = GramHash.Ws.split(text.toString, -1)
    val m = toks.length
    if (m < 3) return Empty
    val out = new Array[Long](m - 2)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < m - 2) {
      val d = GramHash.digest3(toks, i, sb)
      out(i) = (GramHash.u32(d, 0) << 32) | GramHash.u32(d, 4)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** The ONE 3-word-gram md5 core behind `shingle_hashes` and
  * `winnow_prints`: the gram join (single spaces) and the
  * unsigned-byte packing are the byte-faithfulness contract with the
  * DuckDB mirror strings (`('0x'||substr(md5(sh),1,8))::BIGINT`), so
  * they must live in exactly one place (r9 review fix — both
  * expressions previously carried verbatim copies). Tokenization
  * stays per-caller: winnowing lowercases first, shingles hash the
  * raw text. */
private[functions] object GramHash {
  val Ws: Pattern = Pattern.compile("\\s+")
  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** md5 of `toks(i) + ' ' + toks(i+1) + ' ' + toks(i+2)`. The
    * returned buffer is the digest's own allocation — read it before
    * the next call on this thread. */
  def digest3(toks: Array[String], i: Int,
      sb: java.lang.StringBuilder): Array[Byte] = {
    sb.setLength(0)
    sb.append(toks(i)).append(' ').append(toks(i + 1)).append(' ')
      .append(toks(i + 2))
    val md = md5Local.get()
    md.reset()
    md.digest(sb.toString.getBytes(StandardCharsets.UTF_8))
  }

  /** Digest bytes [o, o+4) as an unsigned 32-bit value — exactly
    * `conv(substring(md5_hex, 2o+1, 8), 16, 10)`. */
  def u32(d: Array[Byte], o: Int): Long =
    ((d(o) & 0xffL) << 24) | ((d(o + 1) & 0xffL) << 16) |
      ((d(o + 2) & 0xffL) << 8) | (d(o + 3) & 0xffL)
}
