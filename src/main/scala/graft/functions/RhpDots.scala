package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Native random-hyperplane sign bucket (`rhp_bucket(embedding,
  * planes)`): the packed `planes`-bit sign sketch of a 64-dim vector —
  * bit p set iff round(Σ_d x_d · coef(p, d), 6) >= 0 — in ONE fused
  * primitive loop per row. The sign-sketch hot loop of the RHP-LSH
  * family (q53/q54/q92 and semDedup's candidate stage).
  *
  * BYTE-FAITHFUL to the declarative chain it replaces (per plane:
  * `aggregate(zip_with(embedding, plane, (x, c) -> double(x) * c),
  * 0.0, (acc, v) -> acc + v)`, then `when(round(dot, 6) >= 0.0,
  * 1L << p).otherwise(0L)`, summed):
  *  - identical coefficient derivation (md5("p:d") top-32 bits scaled
  *    to [-1, 1)), identical ascending-d accumulation order — every
  *    dot is the identical IEEE double;
  *  - round(dot, 6) replicated via the same HALF_UP
  *    BigDecimal.valueOf path Spark's Round uses for DoubleType;
  *  - zip_with's ragged-input semantics reproduced: a vector whose
  *    length differs from 64 (or with a null element) null-poisons
  *    every fold, each `when` falls to otherwise(0), bucket = 0.
  * A NULL embedding maps to bucket 0 in the declarative chain; the
  * caller (Similarity.rhpBuckets) restores that with a coalesce since
  * this expression is null-propagating like any binary expression.
  * The DuckDB mirrors are untouched.
  *
  * Computing the whole bucket in one call (rather than a dots array
  * read by 16-32 element_at consumers) keeps the cost one-loop-per-row
  * even in plan shapes where common-subexpression elimination does not
  * fire.
  */
case class RhpDots(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      if (right.dataType == IntegerType && right.foldable &&
          right.eval() != null && {
            val p = right.eval().asInstanceOf[Number].intValue()
            p >= 1 && p <= RhpDots.Dims
          })
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"rhp_bucket planes must be a literal int in [1, ${RhpDots.Dims}]")
    case dt => TypeCheckResult.TypeCheckFailure(
      s"rhp_bucket expects array<float>/array<double>, got ${dt.catalogString}")
  }

  private def elemIsFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any, p: Any): Any =
    RhpDots.bucket(v.asInstanceOf[ArrayData], p.asInstanceOf[Int], elemIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = elemIsFloat
    defineCodeGen(ctx, ev,
      (a, p) => s"graft.functions.RhpDots.bucket($a, $p, $f)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RhpDots =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "rhp_bucket"
}

object RhpDots {
  val Dims = 64

  /** md5-seeded plane coefficient — the ONE derivation shared with the
    * declarative twin and the SQL oracle mirrors: top 32 bits of
    * md5("p:d") scaled to [-1, 1). */
  def coef(p: Int, d: Int): Double = {
    val dig = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$p:$d".getBytes("UTF-8"))
    val hex = dig.take(4).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex, 16).toDouble / 2147483648.0 - 1.0
  }

  // coefficient matrix resolved once per JVM: [p][d]
  private lazy val coefs: Array[Array[Double]] =
    Array.tabulate(Dims, Dims)((p, d) => coef(p, d))

  /** Exactly Spark's Round(HALF_UP, 6) on a finite double (the rhp
    * dots are finite: products of finite inputs and |coef| < 1). */
  private def round6(d: Double): Double =
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
    else java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  def bucket(a: ArrayData, planes: Int, isFloat: Boolean): Long = {
    var nullPoisoned = a.numElements() != Dims
    if (!nullPoisoned) {
      var d = 0
      while (d < Dims && !nullPoisoned) {
        if (a.isNullAt(d)) nullPoisoned = true
        d += 1
      }
    }
    // ragged/null-element vector: every plane's zip_with fold is null,
    // every sign bit falls to otherwise(0) — bucket 0
    if (nullPoisoned) return 0L
    val x = new Array[Double](Dims)
    var d = 0
    while (d < Dims) {
      x(d) = if (isFloat) a.getFloat(d).toDouble else a.getDouble(d)
      d += 1
    }
    var b = 0L
    var p = 0
    while (p < planes) {
      val c = coefs(p)
      var acc = 0.0
      var i = 0
      while (i < Dims) { acc += x(i) * c(i); i += 1 }
      if (round6(acc) >= 0.0) b |= (1L << p)
      p += 1
    }
    b
  }
}
