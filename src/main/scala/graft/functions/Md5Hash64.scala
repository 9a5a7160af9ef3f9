package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native portable 64-bit content hash (`portable_hash64(text)`):
  * md5 of the UTF-8 bytes, first 8 digest bytes packed as
  * `(u32(d,0) << 32) | u32(d,4)` — the [[ShingleHashes]] packing.
  *
  * BYTE-FAITHFUL to the declarative chain it replaces (the per-token
  * hot loop of the simhash / feature-hash family):
  *   hi32 = conv(substring(md5(s), 1, 8), 16, 10)  = digest bytes 0-3
  *   lo32 = conv(substring(md5(s), 9, 8), 16, 10)  = digest bytes 4-7
  * so `hash >>> 32` IS the old `baseHash`/`h32` value and
  * `hash & 0xFFFFFFFF` IS `baseHashHi`/`h32hi` — pure integer
  * unpacking, no value change anywhere downstream. The DuckDB mirrors
  * (`('0x'||substr(md5(s),1,8))::BIGINT` etc.) are untouched.
  *
  * This is a pure plan-cost change (guide §4.1: prefer built-in/native
  * JVM expressions in the hot path): the md5-hex STRING round-trip —
  * 32-char hex encode, two substrings, two base-16 string parses, and
  * a SECOND full md5 digest for the high half — collapses into one
  * digest call per row with a thread-local MessageDigest and zero
  * string allocation.
  */
case class Md5Hash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"portable_hash64 expects a string, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType

  override def nullSafeEval(t: Any): Any =
    Md5Hash64.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.Md5Hash64.compute($t)")

  override protected def withNewChildInternal(
      newChild: Expression): Md5Hash64 = copy(child = newChild)

  override def prettyName: String = "portable_hash64"
}

object Md5Hash64 {
  private val md5Local =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  def compute(s: UTF8String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes)
    (GramHash.u32(d, 0) << 32) | GramHash.u32(d, 4)
  }
}
